"""Sequence-parallel (ring attention) train step vs the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.parallel.sp_step import make_sp_train_step
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=2,   # GQA exercised through the ring
)
LCFG = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))


def test_sp_step_matches_single_device(mesh):
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)

    B, S = 4, 32      # S sharded 4-way: 8 tokens per device
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    s_sp = init_train_state(lora, opt)
    sp_step = make_sp_train_step(CFG, LCFG, opt, mesh, params, s_sp,
                                 donate=False)

    for i in range(3):
        rng = jax.random.PRNGKey(70 + i)
        s_ref, m_ref = ref_step(s_ref, params, batch, rng)
        s_sp, m_sp = sp_step(s_sp, params, batch, rng)
        np.testing.assert_allclose(float(m_sp["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=5e-3)
        np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                                   rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_sp.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


def test_sp_step_accumulation_matches_single_device(mesh):
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)

    ACC, B, S = 2, 4, 32
    ids = jax.random.randint(jax.random.PRNGKey(2), (ACC, B, S), 0,
                             CFG.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=ACC, donate=False)
    s_sp = init_train_state(lora, opt)
    sp_step = make_sp_train_step(CFG, LCFG, opt, mesh, params, s_sp,
                                 accum_steps=ACC, donate=False)

    for i in range(2):
        rng = jax.random.PRNGKey(70 + i)
        s_ref, m_ref = ref_step(s_ref, params, batch, rng)
        s_sp, m_sp = sp_step(s_sp, params, batch, rng)
        np.testing.assert_allclose(float(m_sp["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=5e-3)
        np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                                   rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_sp.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


@pytest.fixture(scope="module")
def mesh_wsh():
    """dp×fsdp×tp×sp — weight-sharded ring (sp_step module docstring)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 2, 2, 2),
                ("dp", "fsdp", "tp", "sp"))


def test_sp_fsdp_tp_step_matches_single_device(mesh_wsh):
    """VERDICT r2 #3: sequence parallelism composed with fsdp weight
    sharding (jit per-layer gather) + tp gather + ZeRO-1 optimizer state
    must reproduce the single-device step's grads/updates exactly."""
    from jax.sharding import NamedSharding
    from qlora_tpu.parallel.sharded_step import (
        init_sharded_train_state, sharded_param_shardings)

    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)

    B, S = 4, 32      # S sharded 2-way, B over fsdp=2
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)

    s_sp = init_sharded_train_state(lora, opt, mesh_wsh)   # ZeRO-1 over fsdp
    p_sh = jax.tree_util.tree_map(
        jax.device_put, params, sharded_param_shardings(params, mesh_wsh))
    sp_step = make_sp_train_step(CFG, LCFG, opt, mesh_wsh, p_sh, s_sp,
                                 clip_norm=0.3, donate=False)

    for i in range(3):
        rng = jax.random.PRNGKey(70 + i)
        s_ref, m_ref = ref_step(s_ref, params, batch, rng)
        s_sp, m_sp = sp_step(s_sp, p_sh, batch, rng)
        np.testing.assert_allclose(float(m_sp["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=5e-3)
        np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                                   rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_sp.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


def test_sp_step_converges(mesh):
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 5e-3, total_steps=20)
    state = init_train_state(lora, opt)
    step = make_sp_train_step(CFG, LCFG, opt, mesh, params, state,
                              donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 32), 0, CFG.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}
    losses = []
    for i in range(5):
        state, m = step(state, params, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and all(np.isfinite(losses))
