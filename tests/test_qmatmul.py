"""Fused dequant-matmul: Pallas (interpret) vs dequant→dot oracle, and VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.quant import quantize, dequantize
from qlora_tpu.ops import qmatmul


def _mk(key, M, K, N, **qkw):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (M, K), dtype=jnp.float32)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    return x, quantize(w, **qkw)


@pytest.mark.parametrize("shape", [(32, 256, 128), (16, 256, 384), (9, 512, 128)])
@pytest.mark.parametrize("double_quant", [False, True])
def test_pallas_matches_xla(shape, double_quant):
    M, K, N = shape
    x, qt = _mk(0, M, K, N, double_quant=double_quant)
    y_ref = qmatmul(x, qt, "xla")
    y_pl = qmatmul(x, qt, "pallas")
    np.testing.assert_allclose(
        np.asarray(y_pl, dtype=np.float32),
        np.asarray(y_ref, dtype=np.float32),
        atol=0.05, rtol=0.05,
    )


def test_pallas_large_m_tile_branch_matches_xla():
    # M>=512 with K2 % 2048 == 0 takes the TKp=2048/TN=256 training tiles
    M, K, N = 512, 4096, 256
    x, qt = _mk(7, M, K, N)
    y_ref = qmatmul(x, qt, "xla")
    y_pl = qmatmul(x, qt, "pallas")
    np.testing.assert_allclose(
        np.asarray(y_pl, np.float32), np.asarray(y_ref, np.float32),
        atol=0.6, rtol=0.05,   # wider abs tol: K=4096 accumulation
    )


def test_forward_matches_exact_dequant_fp32():
    # fp32 accumulate in the kernel: compare against fp32 x @ dequant(W)
    M, K, N = 8, 256, 128
    x, qt = _mk(1, M, K, N, double_quant=False)
    w = dequantize(qt, dtype=jnp.float32)
    want = x.astype(jnp.bfloat16).astype(jnp.float32) @ w
    got = np.asarray(qmatmul(x, qt, "pallas"), dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_vjp_dx_matches_dequant_reference(impl):
    M, K, N = 16, 256, 256
    x, qt = _mk(2, M, K, N)
    w = dequantize(qt, dtype=jnp.float32)

    def f(x_):
        return jnp.sum(qmatmul(x_, qt, impl).astype(jnp.float32) ** 2)

    def f_ref(x_):
        y = (x_.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)).astype(jnp.float32)
        return jnp.sum(y.astype(jnp.bfloat16).astype(jnp.float32) ** 2)

    gx = jax.grad(f)(x)
    gx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_ref, np.float32), atol=0.3, rtol=0.1
    )


def test_no_gradient_leaks_to_quantized_weight():
    M, K, N = 8, 128, 128
    x, qt = _mk(3, M, K, N)

    def f(x_, qt_):
        return jnp.sum(qmatmul(x_, qt_, "xla").astype(jnp.float32))

    # differentiating wrt x must work; qt leaves must receive zero/float0 cotangent
    _, vjp_fn = jax.vjp(f, x, qt)
    dx, dqt = vjp_fn(jnp.float32(1.0))
    assert dx.shape == x.shape
    for leaf in jax.tree_util.tree_leaves(dqt):
        arr = np.asarray(leaf)
        if arr.dtype != jax.dtypes.float0:
            assert np.all(arr == 0)


def test_qmatmul_under_jit_and_grad():
    M, K, N = 8, 128, 128
    x, qt = _mk(4, M, K, N)

    @jax.jit
    def step(x_):
        return jax.grad(lambda z: jnp.sum(qmatmul(z, qt, "auto").astype(jnp.float32)))(x_)

    g = step(x)
    assert g.shape == (M, K)
    assert np.isfinite(np.asarray(g, np.float32)).all()
