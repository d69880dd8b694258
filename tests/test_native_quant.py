"""Native C++ quantizer vs the jnp oracle: packed bytes + scales parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from qlora_tpu.quant import dequantize, quantize
from qlora_tpu.utils.native_quant import native_available, quantize_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("double_quant", [False, True])
def test_native_matches_jnp(double_quant):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 96)).astype(np.float32)
    ref = quantize(jnp.asarray(w), double_quant=double_quant)
    nat = quantize_native(w, double_quant=double_quant)

    pk_ref = np.asarray(ref.packed)
    pk_nat = np.asarray(nat.packed)
    # float rounding at codebook midpoints can differ by 1 code on exact ties;
    # demand near-perfect byte agreement and tight dequant agreement
    agree = (pk_ref == pk_nat).mean()
    assert agree > 0.999, agree
    wd_ref = np.asarray(dequantize(ref, jnp.float32))
    wd_nat = np.asarray(dequantize(nat, jnp.float32))
    np.testing.assert_allclose(wd_nat, wd_ref, atol=0.02)


def test_native_fp4():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 32)).astype(np.float32)
    ref = quantize(jnp.asarray(w), quant_type="fp4", double_quant=False)
    nat = quantize_native(w, quant_type="fp4", double_quant=False)
    wd_ref = np.asarray(dequantize(ref, jnp.float32))
    wd_nat = np.asarray(dequantize(nat, jnp.float32))
    np.testing.assert_allclose(wd_nat, wd_ref, atol=0.02)


def test_native_speedup_reasonable():
    # sanity: native path quantizes a 4k x 4k tensor in reasonable time
    import time

    rng = np.random.default_rng(2)
    w = rng.standard_normal((4096, 4096)).astype(np.float32)
    t0 = time.perf_counter()
    quantize_native(w)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"native quantize took {dt:.1f}s"
