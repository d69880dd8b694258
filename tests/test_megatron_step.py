"""Megatron-style dp×tp step: exact gradients, sharded LoRA/optimizer
state, collective count vs the gather style."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.parallel.megatron_step import (
    init_megatron_state,
    make_megatron_train_step,
    requantize_row_parallel,
)
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=2,   # GQA heads split across tp
)
LCFG = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))


def _setup():
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)
    return params, lora, opt


def _batch(B=8, S=16):
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    return {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
            "labels": ids}


def test_requantize_row_parallel_preserves_values():
    params, _, _ = _setup()
    tp = 2
    rp = requantize_row_parallel(params, tp)
    from qlora_tpu.quant.blockwise import dequantize

    wo = rp["blocks"]["wo"].qt
    assert wo.k_shards == tp
    w_old = dequantize(
        jax.tree_util.tree_map(lambda x: x[0], params["blocks"]["wo"].qt),
        jnp.float32)
    w_new = dequantize(
        jax.tree_util.tree_map(lambda x: x[0], wo), jnp.float32)
    # block absmaxes survive (the max element re-quantizes to the ±1 code),
    # but DOUBLE-QUANT absmax reconstruction is lossy (~0.2% per-chunk
    # offset/scale epsilon) — values must agree to that budget
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_old),
                               atol=5e-4, rtol=5e-3)

    # without double quant the re-pack is EXACT
    from qlora_tpu.quant.blockwise import quantize, quantize_k_sharded
    w = jax.random.normal(jax.random.PRNGKey(7), (256, 128), jnp.float32)
    qt = quantize(w, double_quant=False)
    wd = dequantize(qt, jnp.float32)
    qt2 = quantize_k_sharded(wd, 2, double_quant=False)
    np.testing.assert_array_equal(np.asarray(dequantize(qt2, jnp.float32)),
                                  np.asarray(wd))


def test_megatron_matches_single_device_3_steps(mesh):
    params, lora, opt = _setup()
    mega_params = requantize_row_parallel(params, mesh.shape["tp"])
    batch = _batch()

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    s_m = init_megatron_state(lora, opt, mesh)
    m_step = make_megatron_train_step(CFG, LCFG, opt, mesh, mega_params, s_m,
                                      donate=False)

    for i in range(3):
        rng = jax.random.PRNGKey(80 + i)
        # reference uses the SAME re-packed base (double-quant re-pack is
        # ~0.2%-lossy, so original-params logits differ slightly)
        s_ref, m_ref = ref_step(s_ref, mega_params, batch, rng)
        s_m, m_m = m_step(s_m, mega_params, batch, rng)
        np.testing.assert_allclose(float(m_m["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=5e-3,
                                   err_msg=f"step {i}")
        np.testing.assert_allclose(float(m_m["loss"]), float(m_ref["loss"]),
                                   rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_m.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 8e-3 and d.mean() < 2e-4


def test_megatron_grads_elementwise_exact(mesh):
    """SGD(1.0) step ⇒ param delta == −grad, per element."""
    params, lora, _ = _setup()
    mega_params = requantize_row_parallel(params, mesh.shape["tp"])
    opt = optax.sgd(1.0)
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    s_ref2, _ = ref_step(s_ref, mega_params, batch, rng)

    s_m = init_megatron_state(lora, opt, mesh)
    m_step = make_megatron_train_step(CFG, LCFG, opt, mesh, mega_params, s_m,
                                      clip_norm=None, donate=False)
    s_m2, _ = m_step(s_m, mega_params, batch, rng)

    for g_ref, g_m in zip(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: a - b, s_ref.trainable, s_ref2.trainable)),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: a - b, s_m.trainable, s_m2.trainable)),
    ):
        g_ref, g_m = np.asarray(g_ref), np.asarray(g_m)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(g_m, g_ref, rtol=5e-2, atol=2e-2 * scale)


def test_megatron_accumulation_matches_reference(mesh):
    """accum=2 scan inside the megatron step == single-device accum=2."""
    params, lora, opt = _setup()
    mega_params = requantize_row_parallel(params, mesh.shape["tp"])
    ACCUM = 2
    b = _batch(B=8, S=16)
    batch = {k: jnp.stack([v, jnp.roll(v, 1, axis=0)]) for k, v in b.items()}

    s_ref = init_train_state(lora, opt)
    ref_step = make_train_step(CFG, LCFG, opt, accum_steps=ACCUM,
                               donate=False)
    s_m = init_megatron_state(lora, opt, mesh)
    m_step = make_megatron_train_step(CFG, LCFG, opt, mesh, mega_params, s_m,
                                      accum_steps=ACCUM, donate=False)
    rng = jax.random.PRNGKey(5)
    s_ref, m_ref = ref_step(s_ref, mega_params, batch, rng)
    s_m, m_m = m_step(s_m, mega_params, batch, rng)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_ref["loss"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(m_m["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=5e-3)


def test_megatron_lora_state_is_tp_sharded(mesh):
    _, lora, opt = _setup()
    state = init_megatron_state(lora, opt, mesh)
    tp = mesh.shape["tp"]
    b = state.trainable["wq"]["b"]           # column linear: B sharded on N
    assert b.addressable_shards[0].data.shape[-1] == b.shape[-1] // tp
    a = state.trainable["wo"]["a"]           # row linear: A sharded on K
    assert a.addressable_shards[0].data.shape[1] == a.shape[1] // tp
    # optimizer state mirrors (adam mu/nu of the SAME leaves — match by
    # keypath, not shape: row-parallel wo/w_down have same-shape b leaves
    # that are intentionally replicated)
    mus = [
        x for path, x in jax.tree_util.tree_flatten_with_path(
            state.opt_state)[0]
        if "'wq'" in str(path) and "'b'" in str(path)
        and getattr(x, "shape", None) == b.shape
    ]
    assert mus and all(
        m.addressable_shards[0].data.shape[-1] == b.shape[-1] // tp
        for m in mus
    )


def test_megatron_fewer_collectives_than_gather_style(mesh):
    """The megatron block emits ~2 reduces per sub-block instead of an
    all-gather per linear: count collectives in the lowered HLO."""
    params, lora, opt = _setup()
    mega_params = requantize_row_parallel(params, mesh.shape["tp"])
    batch = _batch()

    s_m = init_megatron_state(lora, opt, mesh)
    m_step = make_megatron_train_step(CFG, LCFG, opt, mesh, mega_params, s_m,
                                      donate=False)
    hlo_m = jax.jit(m_step).lower(s_m, mega_params, batch,
                                  jax.random.PRNGKey(0)).as_text()

    from qlora_tpu.parallel.sharded_step import (
        init_sharded_train_state, make_sharded_train_step)
    import numpy as _np
    mesh3 = Mesh(_np.asarray(jax.devices()[:8]).reshape(4, 1, 2),
                 ("dp", "fsdp", "tp"))
    s_g = init_sharded_train_state(lora, opt, mesh3)
    g_step = make_sharded_train_step(CFG, LCFG, opt, mesh3, params, s_g,
                                     donate=False)
    hlo_g = jax.jit(g_step).lower(s_g, params, batch,
                                  jax.random.PRNGKey(0)).as_text()

    # lowered text is StableHLO MLIR; count the op name exactly (each op
    # line also carries an `all_gather_dim` attribute)
    def count(h, op):
        return h.count(op)

    gathers_m = count(hlo_m, "stablehlo.all_gather")
    gathers_g = count(hlo_g, "stablehlo.all_gather")
    assert gathers_m < gathers_g, (gathers_m, gathers_g)
    # the megatron BLOCK is all-gather-free: the only gathers are the
    # embed feature gather and the lm_head output gather (once each,
    # layer-count-independent)
    assert gathers_m <= 2, gathers_m
