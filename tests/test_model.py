"""Model forward tests: shapes, determinism, cache-vs-full equivalence, LoRA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import (
    forward, get_config, init_cache, init_lora_params, init_params,
)


@pytest.fixture(scope="module", params=["debug", "debug-neox", "debug-gemma"])
def setup(request):
    cfg = get_config(request.param)
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg, quantized=True)
    lcfg = LoraConfig(r=8, alpha=16)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    return cfg, params, lora, lcfg


def test_forward_shapes(setup):
    cfg, params, lora, lcfg = setup
    ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
    logits, cache = forward(params, lora, ids, cfg, lcfg)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert cache is None
    assert np.isfinite(np.asarray(logits)).all()


def test_fresh_lora_is_identity(setup):
    cfg, params, lora, lcfg = setup
    ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    logits_with, _ = forward(params, lora, ids, cfg, lcfg)
    logits_without, _ = forward(params, None, ids, cfg, lcfg)
    # B initialized to zeros => LoRA contributes exactly nothing
    np.testing.assert_allclose(
        np.asarray(logits_with), np.asarray(logits_without), atol=1e-5
    )


def test_padding_mask_blocks_attention(setup):
    cfg, params, lora, lcfg = setup
    ids_a = jnp.array([[5, 6, 7, 0, 0, 0]], dtype=jnp.int32)
    ids_b = jnp.array([[5, 6, 7, 9, 9, 9]], dtype=jnp.int32)
    m = jnp.array([[1, 1, 1, 0, 0, 0]], dtype=jnp.int32)
    la, _ = forward(params, None, ids_a, cfg, attn_mask=m)
    lb, _ = forward(params, None, ids_b, cfg, attn_mask=m)
    # logits at real positions must not depend on padded token ids
    np.testing.assert_allclose(
        np.asarray(la[:, :3]), np.asarray(lb[:, :3]), atol=1e-5
    )


def test_cache_decode_matches_full_forward(setup):
    cfg, params, lora, lcfg = setup
    B, S = 2, 6
    key = jax.random.PRNGKey(3)
    ids = jax.random.randint(key, (B, S), 0, cfg.vocab_size)

    full_logits, _ = forward(params, lora, ids, cfg, lcfg)

    cache = init_cache(cfg, B, max_len=16)
    # prefill first 3 tokens, then decode one at a time
    logits_p, cache = forward(params, lora, ids[:, :3], cfg, lcfg, cache=cache)
    step_logits = [logits_p]
    for t in range(3, S):
        lt, cache = forward(params, lora, ids[:, t : t + 1], cfg, lcfg, cache=cache)
        step_logits.append(lt)
    inc_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc_logits), atol=2e-2, rtol=2e-2
    )


def test_remat_matches_noremat(setup):
    cfg, params, lora, lcfg = setup
    ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    l1, _ = forward(params, lora, ids, cfg, lcfg, remat=False)
    l2, _ = forward(params, lora, ids, cfg, lcfg, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_gqa_llama2_70b_shapes():
    # GQA: kv heads < heads; use a tiny synthetic GQA config
    from qlora_tpu.models.config import ModelConfig
    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=8, num_kv_heads=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 2, 3]], dtype=jnp.int32)
    logits, _ = forward(params, None, ids, cfg)
    assert logits.shape == (1, 3, 512)
    assert np.isfinite(np.asarray(logits)).all()


def test_flash_path_matches_jnp_path():
    # S=128 triggers the flash kernel; compare against use_flash="never"
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(5), cfg, quantized=True)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 128), 0, cfg.vocab_size)
    m = jnp.ones((2, 128), jnp.int32).at[1, 100:].set(0)
    la, _ = forward(params, None, ids, cfg, attn_mask=m, use_flash="always")
    lb, _ = forward(params, None, ids, cfg, attn_mask=m, use_flash="never")
    np.testing.assert_allclose(
        np.asarray(la[:, :100]), np.asarray(lb[:, :100]), atol=0.15, rtol=0.05
    )


def test_sliding_window_limits_attention():
    from qlora_tpu.models.config import ModelConfig
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=1, num_heads=2, num_kv_heads=2, sliding_window=4,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=False)
    # two prompts differing only in early tokens beyond the window
    a = jnp.asarray([[9, 8, 7, 1, 2, 3, 4, 5]], jnp.int32)
    b = jnp.asarray([[1, 2, 3, 1, 2, 3, 4, 5]], jnp.int32)
    la, _ = forward(params, None, a, cfg)
    lb, _ = forward(params, None, b, cfg)
    # last position attends only the last 4 tokens => identical logits
    np.testing.assert_allclose(
        np.asarray(la[0, -1]), np.asarray(lb[0, -1]), atol=1e-5
    )
    # but early positions differ
    assert np.abs(np.asarray(la[0, 1]) - np.asarray(lb[0, 1])).max() > 1e-3


def test_qwen2_style_bias_init():
    from qlora_tpu.models.config import ModelConfig
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=1, attention_bias=True,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    assert params["blocks"]["wq"].bias is not None
    assert params["blocks"]["wo"].bias is None
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, _ = forward(params, None, ids, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_unrolled_decode_matches_scan_decode():
    """forward() over per-layer (unstacked) trees ≡ the lax.scan path on
    the cache decode, within bf16 fusion-boundary tolerance (the serving
    engines run unrolled — models/unstack.py)."""
    import numpy as np

    from qlora_tpu.models.transformer import init_cache
    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, LoraConfig(r=4))
    B, S, T = 2, 6, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    cache = init_cache(cfg, B, T)
    logits, cache = forward(params, lora, ids, cfg, LoraConfig(r=4),
                            cache=cache)
    cache = dict(cache, length=jnp.full((B,), S, jnp.int32))
    pu = unstack_params(params)
    lu = unstack_lora(lora, cfg.num_layers)
    cu = unstack_cache(cache)
    assert isinstance(pu["blocks"], list) and len(pu["blocks"]) == cfg.num_layers
    assert unstack_params(pu) is pu      # idempotent
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    for _ in range(3):
        l1, cache = forward(params, lora, tok, cfg, LoraConfig(r=4),
                            cache=cache)
        l2, cu = forward(pu, lu, tok, cfg, LoraConfig(r=4), cache=cu)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=5e-2, rtol=5e-2)
        tok = jnp.argmax(l1[:, 0], -1)[:, None].astype(jnp.int32)
