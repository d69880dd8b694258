"""Multi-device tests on the virtual 8-CPU mesh: GSPMD sharding of the
quantized param tree + shard_map tensor parallelism through the pallas path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from qlora_tpu.ops import qmatmul
from qlora_tpu.quant import QuantizedTensor, quantize, dequantize

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    import numpy as _np
    return Mesh(_np.asarray(jax.devices()[:4]).reshape(4), ("tp",))


def _mk(K=256, N=512):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (16, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    return x, quantize(w)


def _qt_specs(qt):
    return QuantizedTensor(
        packed=P(None, "tp"), absmax=P(None, "tp"),
        absmax_scale=None if qt.absmax_scale is None else P(None, "tp"),
        absmax_offset=None if qt.absmax_offset is None else P(),
        shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
    )


def test_column_parallel_qmatmul_shard_map(mesh):
    x, qt = _mk()
    want = np.asarray(qmatmul(x, qt, "xla"), np.float32)

    def local(x_, qt_):
        # per-device: x replicated, weight N-shard → output N-shard
        return qmatmul(x_, qt_, "xla")

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), _qt_specs(qt)),
        out_specs=P(None, "tp"),
        check_rep=False,
    )
    got = np.asarray(f(x, qt), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_column_parallel_grad_flows(mesh):
    x, qt = _mk()

    def loss(x_):
        def local(x_, qt_):
            return qmatmul(x_, qt_, "xla")
        y = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None), _qt_specs(qt)),
            out_specs=P(None, "tp"), check_rep=False,
        )(x_, qt)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    w = np.asarray(dequantize(qt, jnp.float32))
    y = np.asarray(x, np.float32) @ w
    want = 2 * y @ w.T
    np.testing.assert_allclose(np.asarray(g, np.float32), want, atol=2.0, rtol=0.1)


def test_gspmd_auto_sharded_dequant_matmul(mesh):
    # jit + NamedSharding (no shard_map): XLA partitions the xla-impl graph
    x, qt = _mk()
    sh = NamedSharding(mesh, P(None, "tp"))
    qt_sharded = QuantizedTensor(
        packed=jax.device_put(qt.packed, sh),
        absmax=jax.device_put(qt.absmax, sh),
        absmax_scale=jax.device_put(qt.absmax_scale, sh),
        absmax_offset=jax.device_put(qt.absmax_offset, NamedSharding(mesh, P())),
        shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
    )
    f = jax.jit(lambda x_, q_: qmatmul(x_, q_, "xla"))
    got = np.asarray(f(x, qt_sharded), np.float32)
    want = np.asarray(qmatmul(x, qt, "xla"), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
