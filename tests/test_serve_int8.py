"""int8 decode-serving paths: w8a8 NF4 kernel, direct per-column int8
kernel, offline requantization, PagedBatcher opt-in."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.ops.qmatmul import (
    _qmm_pallas_i8_direct,
    _qmm_pallas_w8a8,
    default_impl,
    qmatmul,
)
from qlora_tpu.quant.blockwise import absmax_f32, dequantize, quantize


@pytest.fixture(scope="module")
def wq():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 384), jnp.float32) * 0.05
    return w, quantize(w)


def test_w8a8_nf4_kernel_close_to_exact(wq):
    w, qt = wq
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 256), jnp.float32) * 0.1
    am = absmax_f32(qt)
    got = _qmm_pallas_w8a8(x, qt.packed, am, qt.shape, qt.block_size,
                           qt.quant_type)
    want = x @ dequantize(qt, jnp.float32)
    rel = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max() / (
        np.abs(np.asarray(want)).max())
    assert rel < 0.05, rel                 # per-channel int8 noise budget


def test_i8_direct_kernel_close_to_exact(wq):
    w, qt = wq
    K, N = qt.shape
    x = jax.random.normal(jax.random.PRNGKey(2), (16, K), jnp.float32) * 0.1
    wd = dequantize(qt, jnp.float32)
    col = jnp.max(jnp.abs(wd), axis=0)
    w8 = jnp.round(wd * (127.0 / col)[None, :]).astype(jnp.int8)
    got = _qmm_pallas_i8_direct(x, w8, col, (K, N))
    want = x @ wd
    rel = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max() / (
        np.abs(np.asarray(want)).max())
    assert rel < 0.05, rel


def test_default_impl_w8a8_routes_per_column_int8(wq):
    """qmatmul under default_impl('w8a8') with a per-column int8 tensor
    uses the direct kernel and stays close to the exact product."""
    w, _ = wq
    K = w.shape[0]
    qt8 = quantize(w, block_size=K, quant_type="int8", double_quant=False)
    assert qt8.absmax.shape[0] == 1        # per-column scales
    x = jax.random.normal(jax.random.PRNGKey(3), (8, K), jnp.float32) * 0.1
    with default_impl("w8a8"):
        got = qmatmul(x, qt8)
    want = x @ dequantize(qt8, jnp.float32)
    rel = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max() / (
        np.abs(np.asarray(want)).max())
    assert rel < 0.05, rel
    # outside the context the exact path returns (tighter error)
    exact = qmatmul(x, quantize(w))
    ref = x @ dequantize(quantize(w), jnp.float32)
    rel2 = np.abs(np.asarray(exact, np.float32) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max())
    assert rel2 < 0.01


def test_requantize_params_and_paged_decode_runs():
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.generate.serve_int8 import requantize_params_int8
    from qlora_tpu.models import get_config, init_params

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    dec = requantize_params_int8(params)
    wq8 = dec["blocks"]["wq"].qt
    assert wq8.quant_type == "int8" and wq8.block_size == cfg.hidden_size
    # norms/embed shared, not copied
    assert dec["embed"] is params["embed"]

    pb = PagedBatcher(params, None, cfg, num_slots=2, n_pages=64, page_size=8,
                      max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1,
                      decode_impl="int8")
    r = pb.submit([3, 17, 5, 9], max_new_tokens=5)
    pb.run_to_completion()
    assert len(r.generated) == 5
    assert all(0 <= t < cfg.vocab_size for t in r.generated)


def test_paged_int8_decode_logits_close_to_exact():
    """One decode step through the int8 serving tree stays within the
    per-channel-int8 noise budget of the exact NF4 path."""
    from qlora_tpu.generate.serve_int8 import requantize_params_int8
    from qlora_tpu.models import forward, get_config, init_cache, init_params

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    dec = requantize_params_int8(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
    cache = init_cache(cfg, 2, 16)
    logits_p, cache = forward(params, None, ids, cfg, cache=cache)
    cache = dict(cache, length=jnp.full((2,), 6, jnp.int32))
    tok = jnp.argmax(logits_p[:, -1], -1)[:, None].astype(jnp.int32)

    exact, _ = forward(params, None, tok, cfg, cache=cache)
    with default_impl("w8a8"):
        approx, _ = forward(dec, None, tok, cfg, cache=cache)
    e = np.asarray(exact[:, 0], np.float32)
    a = np.asarray(approx[:, 0], np.float32)
    assert np.abs(a - e).max() / np.abs(e).max() < 0.1


def test_paged_w8a8_prefill_opt_in_close_to_exact():
    """prefill_impl='w8a8' routes PREFILL matmuls through the in-kernel int8
    path (~2x MXU rate at bucket-size M on TPU); last-position logits stay
    within the int8 noise budget of the exact bf16 prefill."""
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.models import get_config, init_params

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    prompt = [3, 17, 5, 9, 2, 11]

    outs = {}
    for impl in (None, "w8a8"):
        pb = PagedBatcher(params, None, cfg, num_slots=1, n_pages=64,
                          page_size=8, max_pages_per_seq=8,
                          prefill_buckets=(16,), eos_id=-1,
                          prefill_impl=impl)
        last, _, _ = pb._prefill_kv(
            jnp.asarray([prompt + [0] * 10], jnp.int32), jnp.int32(6), 16)
        outs[impl] = np.asarray(last, np.float32)
    e, a = outs[None], outs["w8a8"]
    assert np.abs(a - e).max() / np.abs(e).max() < 0.1
    # and the full serving loop runs with both overrides active
    pb = PagedBatcher(params, None, cfg, num_slots=1, n_pages=64, page_size=8,
                      max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1,
                      decode_impl="int8", prefill_impl="w8a8")
    r = pb.submit(prompt, max_new_tokens=4)
    pb.run_to_completion()
    assert len(r.generated) == 4
