"""dp×fsdp×tp shard_map train step: exactness, memory sharding, ZeRO-1.

Covers VERDICT round-1 items: the fused-kernel-capable multi-chip path with
fsdp (weight gather) + gradient accumulation, per-device packed-weight
shards shrinking with the mesh, and fsdp-sharded optimizer state (the
paged-optimizer replacement, reference qlora.py:198)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.parallel.sharded_step import (
    init_sharded_train_state,
    make_sharded_train_step,
    sharded_param_shardings,
)
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=4,
)
LCFG = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("dp", "fsdp", "tp"))


def _setup(opt_name="paged_adamw_32bit", lr=1e-3):
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer(opt_name, lr, total_steps=10)
    return params, lora, opt


def _batch(B=8, S=16, accum=None):
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    b = {"input_ids": ids, "attention_mask": jnp.ones_like(ids), "labels": ids}
    if accum:
        b = {k: v.reshape(accum, B // accum, S) for k, v in b.items()}
    return b


def test_dp_fsdp_tp_matches_single_device_3_steps(mesh):
    params, lora, opt = _setup()
    batch = _batch()

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    s_sh = init_sharded_train_state(lora, opt, mesh)
    sh_step = make_sharded_train_step(CFG, LCFG, opt, mesh, params, s_sh,
                                      donate=False)

    for i in range(3):
        rng = jax.random.PRNGKey(50 + i)
        s_ref, m_ref = ref_step(s_ref, params, batch, rng)
        s_sh, m_sh = sh_step(s_sh, params, batch, rng)
        np.testing.assert_allclose(float(m_sh["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=5e-3)
        np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                                   rtol=2e-3)
    # post-Adam element compare is noisy (step-1 update is ±lr for any
    # nonzero grad, so bf16 noise on near-zero grads flips signs): bound the
    # tail, not each element — per-step grad_norm above is the exact check
    for a, b in zip(jax.tree_util.tree_leaves(s_sh.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


def test_sharded_grads_elementwise_exact(mesh):
    """One SGD(1.0) step ⇒ param delta == −grad: per-element gradient parity
    between the dp×fsdp×tp step and jax.grad on a single device."""
    params, lora, _ = _setup()
    opt = optax.sgd(1.0)
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    s_ref2, _ = ref_step(s_ref, params, batch, rng)

    s_sh = init_sharded_train_state(lora, opt, mesh)
    sh_step = make_sharded_train_step(CFG, LCFG, opt, mesh, params, s_sh,
                                      clip_norm=None, donate=False)
    s_sh2, _ = sh_step(s_sh, params, batch, rng)

    for g_ref, g_sh, p in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: a - b, s_ref.trainable,
                                   s_ref2.trainable)),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: a - b, s_sh.trainable,
                                   s_sh2.trainable)),
        jax.tree_util.tree_leaves(lora),
    ):
        g_ref, g_sh = np.asarray(g_ref), np.asarray(g_sh)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(g_sh, g_ref, rtol=5e-2,
                                   atol=2e-2 * scale)


def test_gradient_accumulation_matches_single_device(mesh):
    params, lora, opt = _setup()
    batch = _batch(B=8, S=16, accum=2)

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=2, donate=False)
    s_sh = init_sharded_train_state(lora, opt, mesh)
    sh_step = make_sharded_train_step(CFG, LCFG, opt, mesh, params, s_sh,
                                      accum_steps=2, donate=False)

    rng = jax.random.PRNGKey(7)
    s_ref, m_ref = ref_step(s_ref, params, batch, rng)
    s_sh, m_sh = sh_step(s_sh, params, batch, rng)
    np.testing.assert_allclose(float(m_sh["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=5e-3)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_sh.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


def test_packed_weight_shards_shrink_with_mesh(mesh):
    """fsdp×tp actually divides per-device frozen-weight memory by 4."""
    params, _, _ = _setup()
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, sharded_param_shardings(params, mesh)
    )
    wq = sharded["blocks"]["wq"].qt
    N = wq.packed.shape[-1]
    local = wq.packed.addressable_shards[0].data
    assert local.shape[-1] == N // 4          # tp(2) × fsdp(2)
    assert local.shape[-2] == wq.packed.shape[-2]  # K axis unsharded
    am_local = wq.absmax.addressable_shards[0].data
    assert am_local.shape[-1] == N // 4
    emb = sharded["embed"].addressable_shards[0].data
    assert emb.shape[-1] == params["embed"].shape[-1] // 4


def test_zero1_optimizer_state_is_fsdp_sharded(mesh):
    _, lora, opt = _setup()
    state = init_sharded_train_state(lora, opt, mesh)
    # find a large array leaf of the opt state (adam mu) and check its
    # per-device shard is half the global (fsdp=2)
    big = [x for x in jax.tree_util.tree_leaves(state.opt_state)
           if getattr(x, "ndim", 0) >= 1]
    assert big, "opt state has no array leaves"
    for leaf in big:
        shard = leaf.addressable_shards[0].data
        assert shard.shape[0] == leaf.shape[0] // 2


def test_adam8bit_under_zero1(mesh):
    params, lora, opt = _setup("adam8bit", lr=5e-3)
    batch = _batch()
    state = init_sharded_train_state(lora, opt, mesh)
    step = make_sharded_train_step(CFG, LCFG, opt, mesh, params, state,
                                   donate=False)
    losses = []
    for i in range(4):
        state, m = step(state, params, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and all(np.isfinite(losses))
