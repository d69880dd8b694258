"""Benchmark-only kernel wrappers.

The dispatch path on the dev box (axon relay) caches identical execute
requests and adds high per-call latency, so single-kernel wall-clock is
meaningless.  ``qmm_repeat`` runs the production fwd kernel body under an
extra leading grid dimension that repeats the whole computation R times in
ONE dispatch: device time dominates RPC noise.  Keep this in sync with
``qlora_tpu.ops.qmatmul._qmm_fwd_kernel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qlora_tpu.quant.codebooks import CODEBOOKS
from qlora_tpu.ops.qmatmul import _pick_tile, _scale_rows, _use_interpret


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "reps",
                              "tkp_max", "tn_max", "tm_max")
)
def qmm_repeat(x, packed, am, shape, block_size, quant_type, reps=64,
               tkp_max=512, tn_max=512, tm_max=1024):
    """y = x @ dequant(packed, am), computed `reps` times in one pallas call."""
    K, N = shape
    K2 = K // 2
    M = x.shape[0]
    code = CODEBOOKS[quant_type]

    TKp = _pick_tile(K2, tuple(t for t in (4096, 2048, 1024, 512, 256, 128) if t <= tkp_max))
    TM = _pick_tile(M, tuple(t for t in (1024, 512, 256, 128, 64, 32, 16) if t <= tm_max))
    TN = min(tn_max, 128) if TM <= 64 else _pick_tile(N, tuple(t for t in (512, 256, 128) if t <= tn_max))
    TN = _pick_tile(N, (tn_max,)) if TM <= 64 and tn_max > 128 else TN
    n_slices = TN // 128
    x = x.astype(jnp.bfloat16)

    grid = (reps, M // TM, N // TN, K2 // TKp)
    nb = TKp // block_size
    koff = K2 // TKp
    am_rows = K // block_size
    am3 = am.reshape(am_rows // nb, nb, N)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))

    def kernel(xl_ref, xh_ref, p_ref, aml_ref, amh_ref, tab_ref, o_ref, acc_ref):
        # mirror of _qmm_fwd_kernel with the leading repeat index ignored
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tab_v = tab_ref[:]
        wls, whs = [], []
        for s in range(n_slices):
            sl = slice(s * 128, (s + 1) * 128)
            p32 = p_ref[:, sl].astype(jnp.int32)
            low = p32 & 0x0F
            high = p32 >> 4
            aml = aml_ref[0, :, sl]
            amh = amh_ref[0, :, sl]
            wls.append(_scale_rows(jnp.take_along_axis(tab_v, low, axis=1), aml, block_size).astype(jnp.bfloat16))
            whs.append(_scale_rows(jnp.take_along_axis(tab_v, high, axis=1), amh, block_size).astype(jnp.bfloat16))
        wl = wls[0] if n_slices == 1 else jnp.concatenate(wls, axis=1)
        wh = whs[0] if n_slices == 1 else jnp.concatenate(whs, axis=1)
        acc_ref[:] += jnp.dot(
            xl_ref[:], wl, preferred_element_type=jnp.float32
        ) + jnp.dot(
            xh_ref[:], wh, preferred_element_type=jnp.float32
        )

        @pl.when(k == pl.num_programs(3) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKp), lambda r, i, j, k: (i, k)),
            pl.BlockSpec((TM, TKp), lambda r, i, j, k: (i, k + koff)),
            pl.BlockSpec((TKp, TN), lambda r, i, j, k: (k, j)),
            pl.BlockSpec((1, nb, TN), lambda r, i, j, k: (k, 0, j)),
            pl.BlockSpec((1, nb, TN), lambda r, i, j, k: (k + koff, 0, j)),
            pl.BlockSpec((TKp, 128), lambda r, i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda r, i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x, x, packed, am3, am3, tab)


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "reps",
                              "tk", "tn", "tm_max")
)
def qmm_bwd_repeat(g, packed, am, shape, block_size, quant_type, reps=32,
                   tk=512, tn=512, tm_max=1024):
    """dx = g @ dequant(packed, am)^T, `reps` times in one pallas call —
    repeat-grid mirror of qmatmul._qmm_bwd_kernel for tile ablations."""
    K, N = shape
    K2 = K // 2
    M = g.shape[0]
    code = CODEBOOKS[quant_type]

    TK = _pick_tile(K2, tuple(t for t in (2048, 1024, 512, 256, 128) if t <= tk))
    TN = _pick_tile(N, tuple(t for t in (4096, 2048, 1024, 512, 256, 128) if t <= tn))
    TM = _pick_tile(M, tuple(t for t in (1024, 512, 256, 128, 64, 32, 16) if t <= tm_max))
    n_slices = TN // 128
    g = g.astype(jnp.bfloat16)

    nj_half = K2 // TK
    grid = (reps, M // TM, K // TK, N // TN)
    nb = TK // block_size
    am_rows = K // block_size
    am3 = am.reshape(am_rows // nb, nb, N)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TK, 128 // 16))

    def kernel(g_ref, p_ref, am_ref, tab_ref, o_ref, acc_ref):
        k = pl.program_id(3)
        j = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        gv = g_ref[:]
        tab_v = tab_ref[:]
        for s in range(n_slices):
            sl = slice(s * 128, (s + 1) * 128)
            p32 = p_ref[:, sl].astype(jnp.int32)
            nib = jnp.where(j < nj_half, p32 & 0x0F, p32 >> 4)
            amv = am_ref[0, :, sl]
            w = _scale_rows(jnp.take_along_axis(tab_v, nib, axis=1), amv,
                            block_size)
            acc_ref[:] += jax.lax.dot_general(
                gv[:, sl], w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(k == pl.num_programs(3) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda r, i, j, k: (i, k)),
            pl.BlockSpec((TK, TN), lambda r, i, j, k: (j % nj_half, k)),
            pl.BlockSpec((1, nb, TN), lambda r, i, j, k: (j, 0, k)),
            pl.BlockSpec((TK, 128), lambda r, i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda r, i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(g, packed, am3, tab)


@functools.partial(
    jax.jit, static_argnames=("shape", "reps", "tk", "tn", "tm_max")
)
def i8_direct_repeat(x8, w8, s_out, shape, reps=32, tk=2048, tn=512,
                     tm_max=512):
    """Repeat-grid mirror of qmatmul._qmm_pallas_i8_direct (the int8
    decode-serving kernel): per-column int8 weights, int8 MXU dot."""
    K, N = shape
    M = x8.shape[0]
    TM = _pick_tile(M, tuple(t for t in (512, 256, 128, 64, 32, 16)
                             if t <= tm_max))
    TK = _pick_tile(K, (tk,)) if K % tk == 0 else _pick_tile(K, (1024, 512, 256))
    TN = tn
    grid = (reps, M // TM, N // TN, K // TK)

    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(k == pl.num_programs(3) - 1)
        def _():
            o_ref[:] = (acc_ref[:].astype(jnp.float32) * s_ref[:]).astype(
                jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda r, i, j, k: (i, k)),
            pl.BlockSpec((TK, TN), lambda r, i, j, k: (k, j)),
            pl.BlockSpec((1, TN), lambda r, i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda r, i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x8, w8, s_out)
