"""Unit tests for the blockwise NF4/FP4 quantization core.

Oracle strategy (SURVEY.md §4): independent numpy re-implementation of the
codebook lookup + round-trip error bounds + double-quant exactness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.quant import (
    NF4_CODE,
    FP4_CODE,
    QuantizedTensor,
    quantize,
    dequantize,
    absmax_f32,
    unpack_indices,
    derive_nf4_codebook,
)


def test_nf4_codebook_matches_quantile_derivation():
    scipy = pytest.importorskip("scipy")  # noqa: F841
    derived = derive_nf4_codebook()
    np.testing.assert_allclose(NF4_CODE, derived, atol=1e-6)


def test_nf4_codebook_structure():
    assert NF4_CODE.shape == (16,)
    assert NF4_CODE[0] == -1.0 and NF4_CODE[-1] == 1.0
    assert 0.0 in NF4_CODE  # exact zero must be representable
    assert np.all(np.diff(NF4_CODE) > 0)  # sorted strictly ascending


def test_fp4_codebook_structure():
    assert FP4_CODE.shape == (16,)
    mags = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]) / 6.0
    want = np.sort(np.concatenate([mags, -mags]))
    np.testing.assert_allclose(FP4_CODE, want)
    assert np.all(np.diff(FP4_CODE) >= 0)  # sorted (±0 duplicate allowed)


def _numpy_roundtrip(w, code, block=64):
    """Independent numpy oracle: blockwise scale, nearest-entry, reconstruct."""
    K, N = w.shape
    out = np.empty_like(w, dtype=np.float32)
    for n in range(N):
        for b in range(K // block):
            seg = w[b * block : (b + 1) * block, n].astype(np.float32)
            am = np.abs(seg).max()
            if am == 0:
                out[b * block : (b + 1) * block, n] = 0
                continue
            scaled = seg / am
            idx = np.abs(scaled[:, None] - code[None, :]).argmin(axis=1)
            out[b * block : (b + 1) * block, n] = code[idx] * am
    return out


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
def test_roundtrip_matches_numpy_oracle(quant_type):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 24)).astype(np.float32)
    qt = quantize(jnp.asarray(w), quant_type=quant_type, double_quant=False)
    got = np.asarray(dequantize(qt, dtype=jnp.float32))
    code = NF4_CODE if quant_type == "nf4" else FP4_CODE
    want = _numpy_roundtrip(w, code)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roundtrip_error_bound():
    # NF4 on N(0,1) data: max error per element <= absmax * max gap / 2
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    qt = quantize(jnp.asarray(w), double_quant=False)
    wr = np.asarray(dequantize(qt, dtype=jnp.float32))
    gap = np.diff(NF4_CODE).max() / 2
    blocks = w.reshape(4, 64, 64)
    am = np.abs(blocks).max(axis=1)  # [4, 64]
    err = np.abs(wr - w).reshape(4, 64, 64)
    assert np.all(err <= am[:, None, :] * gap + 1e-6)


def test_exact_codebook_values_roundtrip_exactly():
    # A weight whose entries are exactly codebook*absmax must survive intact.
    am = 3.7
    w = np.ascontiguousarray(np.tile((NF4_CODE * am)[None, :], (128, 1)))[:, :8]
    qt = quantize(jnp.asarray(w), double_quant=False)
    wr = np.asarray(dequantize(qt, dtype=jnp.float32))
    np.testing.assert_allclose(wr, w, rtol=1e-6)


def test_zero_block_handling():
    w = np.zeros((128, 8), dtype=np.float32)
    qt = quantize(jnp.asarray(w))
    wr = np.asarray(dequantize(qt, dtype=jnp.float32))
    assert np.all(wr == 0)


def test_double_quant_close_to_plain():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((512, 96)).astype(np.float32)
    plain = quantize(jnp.asarray(w), double_quant=False)
    dq = quantize(jnp.asarray(w), double_quant=True)
    am_plain = np.asarray(absmax_f32(plain))
    am_dq = np.asarray(absmax_f32(dq))
    # int8 double quant of scales: relative error ~ (range/127)/|value|
    np.testing.assert_allclose(am_dq, am_plain, rtol=0.05, atol=0.02)
    w_plain = np.asarray(dequantize(plain, dtype=jnp.float32))
    w_dq = np.asarray(dequantize(dq, dtype=jnp.float32))
    # reconstructions differ only via scale error
    assert np.abs(w_dq - w_plain).max() < 0.05


def test_double_quant_memory_footprint():
    # 4096x4096: ~0.5 bytes/param packed + scales. Double quant must shrink
    # scale storage ~4x (fp32 -> int8 + 1/256 fp32).
    w = jnp.zeros((4096, 4096))
    plain = quantize(w, double_quant=False)
    dq = quantize(w, double_quant=True)
    n_params = 4096 * 4096
    assert plain.packed.size == n_params // 2
    bits_plain = plain.nbytes * 8 / n_params
    bits_dq = dq.nbytes * 8 / n_params
    assert bits_plain > 4.4  # 4 + 32/64 = 4.5
    assert bits_dq < 4.2     # 4 + ~8/64 + eps ≈ 4.127


def test_unpack_indices_inverts_packing():
    # global split-half layout: row r low nibble, row K/2+r high nibble
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, size=(128, 16)).astype(np.uint8)
    packed = (idx[:64] | (idx[64:] << 4)).astype(np.uint8)
    got = np.asarray(unpack_indices(jnp.asarray(packed)))
    np.testing.assert_array_equal(got, idx)


def test_quantize_validation_errors():
    with pytest.raises(ValueError):
        quantize(jnp.zeros((100, 8)))  # K not divisible by 128
    with pytest.raises(ValueError):
        quantize(jnp.zeros((128,)))  # not 2-D
    with pytest.raises(ValueError):
        quantize(jnp.zeros((128, 8)), quant_type="int4")


def test_quantized_tensor_is_pytree():
    qt = quantize(jnp.ones((128, 8)))
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) >= 2
    # must survive a jit round-trip as an argument/return value
    out = jax.jit(lambda q: q)(qt)
    assert isinstance(out, QuantizedTensor)
    assert out.shape == (128, 8)


def test_bf16_input_quantizes():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((128, 16)).astype(np.float32)
    qt16 = quantize(jnp.asarray(w, dtype=jnp.bfloat16), double_quant=False)
    wr = np.asarray(dequantize(qt16, dtype=jnp.float32))
    # error bounded by NF4 gap/2 * absmax (absmax <= ~4 for this seed) + bf16 rounding
    assert np.abs(wr - w).max() < 0.5


def test_k_sharded_quantization_round_trip_and_row_parallel():
    """Shard-local split-half packing (row-parallel storage): global
    dequant equals per-chunk dequant, and a shard_map row-parallel matmul
    (local chunk + psum) matches the dense product."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from qlora_tpu.ops.qmatmul import qmatmul
    from qlora_tpu.quant.blockwise import (
        QuantizedTensor, dequantize, local_chunk, quantize, quantize_k_sharded,
    )

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")

    K, N, S = 512, 256, 4
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.05
    qt = quantize_k_sharded(w, S)
    assert qt.k_shards == S and qt.absmax_offset.shape == (S,)

    # global chunk-aware dequant ≡ concatenation of per-chunk quantize
    per_chunk = jnp.concatenate([
        dequantize(quantize(w[i * (K // S):(i + 1) * (K // S)]), jnp.float32)
        for i in range(S)
    ], axis=0)
    np.testing.assert_allclose(np.asarray(dequantize(qt, jnp.float32)),
                               np.asarray(per_chunk), atol=1e-6)

    # row-parallel matmul under shard_map: x K-sharded, psum of partials
    mesh = Mesh(np.asarray(jax.devices()[:S]).reshape(S), ("tp",))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.float32)

    def local_fn(x_loc, qt_shard):
        y_part = qmatmul(x_loc, local_chunk(qt_shard))
        return jax.lax.psum(y_part.astype(jnp.float32), "tp")

    qt_specs = QuantizedTensor(
        packed=P("tp", None), absmax=P("tp", None),
        absmax_scale=P("tp", None), absmax_offset=P("tp"),
        shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
        k_shards=qt.k_shards,
    )
    f = shard_map(local_fn, mesh=mesh, in_specs=(P(None, "tp"), qt_specs),
                  out_specs=P(), check_rep=False)
    got = jax.jit(f)(x, qt)
    want = x @ dequantize(qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
