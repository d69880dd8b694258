"""Model-level LoRA merge: merged model ≈ base + adapters."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig, merge_lora_into_params
from qlora_tpu.models import forward, get_config, init_lora_params, init_params


def _trained_lora(cfg, lcfg):
    # make B nonzero so the merge actually changes weights
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    return jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        lora,
    )


def test_merge_dense_matches_adapter_forward():
    cfg = get_config("debug")
    lcfg = LoraConfig(r=4, alpha=8)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lora = _trained_lora(cfg, lcfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)

    with_adapters, _ = forward(params, lora, ids, cfg, lcfg)
    merged = merge_lora_into_params(params, lora, lcfg, requantize=False)
    merged_logits, _ = forward(merged, None, ids, cfg)
    np.testing.assert_allclose(
        np.asarray(with_adapters), np.asarray(merged_logits), atol=0.3, rtol=0.1
    )


def test_merge_requantize_stays_quantized():
    from qlora_tpu.models.layers import QLinear

    cfg = get_config("debug")
    lcfg = LoraConfig(r=4, alpha=8)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lora = _trained_lora(cfg, lcfg)
    merged = merge_lora_into_params(params, lora, lcfg, requantize=True)
    assert isinstance(merged["blocks"]["wq"], QLinear)
    ids = jnp.asarray([[1, 5]], jnp.int32)
    logits, _ = forward(merged, None, ids, cfg)
    assert np.isfinite(np.asarray(logits)).all()
