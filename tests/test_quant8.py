"""--bits 8 path: blockwise int8 base quantization (reference
qlora.py:314,317 / bnb Linear8bitLt capability).

Covers: round-trip accuracy (int8 ≪ nf4 error), fused Pallas matmul vs the
dequant+dot oracle (fwd + grad), double-quant variant, and a CLI smoke run
that meets the same loss-decrease bar as the 4-bit e2e test."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.ops.qmatmul import qmatmul
from qlora_tpu.quant.blockwise import dequantize, quantize


@pytest.mark.parametrize("double_quant", [False, True])
def test_int8_round_trip_error(double_quant):
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
    qt = quantize(w, quant_type="int8", double_quant=double_quant)
    assert qt.packed.dtype == jnp.int8 and qt.packed.shape == (256, 256)
    back = dequantize(qt, jnp.float32)
    err8 = np.abs(np.asarray(back) - np.asarray(w)).mean()
    qt4 = quantize(w, quant_type="nf4", double_quant=double_quant)
    err4 = np.abs(np.asarray(dequantize(qt4, jnp.float32)) - np.asarray(w)).mean()
    assert err8 < err4 / 4          # 8-bit ≫ more accurate than 4-bit
    assert err8 < 6e-3


@pytest.mark.parametrize("double_quant", [False, True])
def test_int8_qmatmul_matches_oracle(double_quant):
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 384), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 256), jnp.float32)
    qt = quantize(w, quant_type="int8", double_quant=double_quant)
    got = qmatmul(x, qt)                       # pallas (interpret on CPU)
    want = jnp.dot(x.astype(jnp.bfloat16), dequantize(qt, jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_int8_qmatmul_grad_matches_oracle():
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 256), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 256), jnp.float32)
    qt = quantize(w, quant_type="int8")

    g_pallas = jax.grad(lambda x: qmatmul(x, qt).astype(jnp.float32).sum())(x)
    g_oracle = jax.grad(
        lambda x: jnp.dot(
            x.astype(jnp.bfloat16), dequantize(qt, jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_oracle),
                               atol=1e-1, rtol=5e-2)


def test_int8_odd_shape_falls_back_to_xla():
    w = jax.random.normal(jax.random.PRNGKey(5), (192, 200), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 192), jnp.float32)
    qt = quantize(w, quant_type="int8")
    got = qmatmul(x, qt)
    want = jnp.dot(x.astype(jnp.bfloat16), dequantize(qt, jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_bits8_cli_smoke_loss_decreases(tmp_path):
    from qlora_tpu.cli import Args, train

    rows = [
        {"input": f"Repeat the word apple {i} times.", "output": "apple " * 3}
        for i in range(64)
    ]
    data = tmp_path / "data.json"
    data.write_text(json.dumps(rows))
    args = Args(
        model_name_or_path="debug-neox", init_random=True, fake_tokenizer=True,
        dataset=str(data), output_dir=str(tmp_path / "out"), bits=8,
        max_steps=10, per_device_train_batch_size=4,
        gradient_accumulation_steps=1, learning_rate=5e-3, lora_r=8,
        source_max_len=48, target_max_len=24, logging_steps=1,
        save_steps=100, do_train=True, do_eval=False, do_predict=False,
        seed=0,
    )
    metrics = train(args)
    hist = metrics["train_metrics"]
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert all(np.isfinite(h["loss"]) for h in hist)
