"""Round-2 fused-qmm experiments (run on the TPU, nothing else running).

Variants, all timed by the repeat-grid slope method (see docs/DESIGN.md §6):
  base      — production _qmm_fwd_kernel mirror (concat of 128-lane slices)
  slicedot  — per-slice dots straight into acc slices (no concat relayout)
  w8a8      — decode nibbles → int8 codes in-kernel (scales folded per
              column; exact col-max from absmax since NF4 hits ±1), int8
              MXU dot at 2× bf16 rate, int32 accumulate, rescale at the end

Prints one JSON line per (variant, M): weight-read GB/s (NF4 bytes / device
time) and MXU utilisation.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable
_cc_enable(jax)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qlora_tpu.ops.qmatmul import _pick_tile, _scale_rows, _use_interpret
from qlora_tpu.ops.bench_kernels import qmm_repeat
from qlora_tpu.quant import quantize
from qlora_tpu.quant.blockwise import absmax_f32
from qlora_tpu.quant.codebooks import CODEBOOKS

HBM_PEAK_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0   # v5e chip peak
MXU_INT8_TOPS = 394.0

K, N = 4096, 4096
BLOCK = 64


# ---------------------------------------------------------------------------
# slicedot variant (bf16, per-slice dots)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("reps", "tkp", "tn", "tm_max"))
def slicedot_repeat(x, packed, am, reps=32, tkp=512, tn=512, tm_max=1024):
    K2 = K // 2
    M = x.shape[0]
    code = CODEBOOKS["nf4"]
    TKp, TN = tkp, tn
    TM = _pick_tile(M, tuple(t for t in (1024, 512, 256, 128, 64, 32, 16)
                             if t <= tm_max))
    n_slices = TN // 128
    x = x.astype(jnp.bfloat16)
    grid = (reps, M // TM, N // TN, K2 // TKp)
    nb = TKp // BLOCK
    koff = K2 // TKp
    am3 = am.reshape((K // BLOCK) // nb, nb, N)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))

    def kernel(xl_ref, xh_ref, p_ref, aml_ref, amh_ref, tab_ref, o_ref, acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tab_v = tab_ref[:]
        xl = xl_ref[:]
        xh = xh_ref[:]
        for s in range(n_slices):
            sl = slice(s * 128, (s + 1) * 128)
            p32 = p_ref[:, sl].astype(jnp.int32)
            wl = _scale_rows(jnp.take_along_axis(tab_v, p32 & 0x0F, axis=1),
                             aml_ref[0, :, sl], BLOCK).astype(jnp.bfloat16)
            wh = _scale_rows(jnp.take_along_axis(tab_v, p32 >> 4, axis=1),
                             amh_ref[0, :, sl], BLOCK).astype(jnp.bfloat16)
            acc_ref[:, sl] += jnp.dot(
                xl, wl, preferred_element_type=jnp.float32
            ) + jnp.dot(xh, wh, preferred_element_type=jnp.float32)

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


# ---------------------------------------------------------------------------
# w8a8 variant: int8 decode + int8 MXU
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("reps", "tkp", "tn", "tm_max"))
def w8a8_repeat(x8, packed, ratio, s127, reps=32, tkp=512, tn=512, tm_max=1024):
    """x8 int8 [M, K] (per-row quantized), ratio = absmax*127/col_max
    [K//B, N] f32, s127 = col_max/127 [1, N] f32.  Output is bf16 WITHOUT
    the per-row xs factor (applied outside; cancels in slope timing)."""
    K2 = K // 2
    M = x8.shape[0]
    code = CODEBOOKS["nf4"]
    TKp, TN = tkp, tn
    TM = _pick_tile(M, tuple(t for t in (1024, 512, 256, 128, 64, 32, 16)
                             if t <= tm_max))
    n_slices = TN // 128
    grid = (reps, M // TM, N // TN, K2 // TKp)
    nb = TKp // BLOCK
    koff = K2 // TKp
    r3 = ratio.reshape((K // BLOCK) // nb, nb, N)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))

    def kernel(xl_ref, xh_ref, p_ref, rl_ref, rh_ref, s_ref, tab_ref, o_ref,
               acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tab_v = tab_ref[:]
        xl = xl_ref[:]
        xh = xh_ref[:]
        for s in range(n_slices):
            sl = slice(s * 128, (s + 1) * 128)
            p32 = p_ref[:, sl].astype(jnp.int32)
            wl8 = jnp.round(
                _scale_rows(jnp.take_along_axis(tab_v, p32 & 0x0F, axis=1),
                            rl_ref[0, :, sl], BLOCK)
            ).astype(jnp.int8)
            wh8 = jnp.round(
                _scale_rows(jnp.take_along_axis(tab_v, p32 >> 4, axis=1),
                            rh_ref[0, :, sl], BLOCK)
            ).astype(jnp.int8)
            acc_ref[:, sl] += jax.lax.dot_general(
                xl, wl8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                xh, wh8, (((1,), (0,)), ((), ())),
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
            pl.BlockSpec((TM, TKp), lambda r, i, j, k: (i, k)),
            pl.BlockSpec((TM, TKp), lambda r, i, j, k: (i, k + koff)),
            pl.BlockSpec((TKp, TN), lambda r, i, j, k: (k, j)),
            pl.BlockSpec((1, nb, TN), lambda r, i, j, k: (k, 0, j)),
            pl.BlockSpec((1, nb, TN), lambda r, i, j, k: (k + koff, 0, j)),
            pl.BlockSpec((1, TN), lambda r, i, j, k: (0, j)),
            pl.BlockSpec((TKp, 128), lambda r, i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda r, i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x8, x8, packed, r3, r3, s127, tab)


# ---------------------------------------------------------------------------
# direct int8 serving variant (offline-requantized weights, no decode)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("reps", "tk", "tn", "tm_max"))
def i8_direct_repeat(x8, w8, s127, reps=32, tk=1024, tn=512, tm_max=512):
    M = x8.shape[0]
    TM = _pick_tile(M, tuple(t for t in (512, 256, 128, 64, 32)
                             if t <= tm_max))
    TK, TN = tk, tn
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
            dimension_semantics=("arbitrary", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x8, w8, s127)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def slope_time(make_fn, r1=8, r2=40, tries=6):
    ts = {}
    for R in (r1, r2):
        f = make_fn(R)
        float(f(jnp.float32(0.5)))   # warmup; host materialization barrier
        best = float("inf")
        for t in range(tries):
            c = jnp.float32(1.0 + t)
            t0 = time.perf_counter()
            float(f(c))              # block_until_ready lies on this relay
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def main():
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    col = jnp.max(am, axis=0)                      # exact col max of |W|
    ratio = am * (127.0 / col)[None, :]
    # y = (x8 @ w8) · sx · sw with sx = rowmax/127 (outside), sw = col/127
    s127 = (col / 127.0).reshape(1, N)
    w_bytes = K * N // 2 + K * N // BLOCK + 4 * K * N // BLOCK // 256
    results = []

    cases = []
    for M in (16, 128, 1024):
        base = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.float32) * 1e-2

        def mk_base(R, M=M, base=base):
            tkp = 2048 if M <= 64 else 512
            return jax.jit(lambda c: jnp.sum(qmm_repeat(
                (base * c).astype(jnp.bfloat16), qt.packed, am,
                qt.shape, qt.block_size, qt.quant_type, reps=R,
                tkp_max=tkp).astype(jnp.float32)))

        cases.append((f"base_M{M}", M, mk_base))

        if M >= 128:
            def mk_slice(R, M=M, base=base):
                return jax.jit(lambda c: jnp.sum(slicedot_repeat(
                    (base * c).astype(jnp.bfloat16), qt.packed, am,
                    reps=R).astype(jnp.float32)))
            cases.append((f"slicedot_M{M}", M, mk_slice))

            def mk_slice_k1024(R, M=M, base=base):
                return jax.jit(lambda c: jnp.sum(slicedot_repeat(
                    (base * c).astype(jnp.bfloat16), qt.packed, am,
                    reps=R, tkp=1024).astype(jnp.float32)))
            cases.append((f"slicedot_k1024_M{M}", M, mk_slice_k1024))

        def mk_w8(R, M=M, base=base):
            tkp = 1024 if M <= 64 else 512
            def f(c):
                xf = base * c
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                x8 = jnp.round(xf / xs).astype(jnp.int8)
                o = w8a8_repeat(x8, qt.packed, ratio, s127, reps=R, tkp=tkp)
                return jnp.sum((o.astype(jnp.float32) * xs))
            return jax.jit(f)
        cases.append((f"w8a8_M{M}", M, mk_w8))

        # offline per-column int8 weights, direct int8 MXU (serving path)
        from qlora_tpu.quant.blockwise import dequantize as _deq
        w8 = jnp.round(_deq(qt, jnp.float32) * (127.0 / col)[None, :]).astype(jnp.int8)

        for tk in (512, 1024, 2048):
            def mk_i8d(R, M=M, base=base, tk=tk):
                def f(c):
                    xf = base * c
                    xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                    x8 = jnp.round(xf / xs).astype(jnp.int8)
                    o = i8_direct_repeat(x8, w8, s127, reps=R, tk=tk)
                    return jnp.sum(o.astype(jnp.float32) * xs)
                return jax.jit(f)
            cases.append((f"i8direct_tk{tk}_M{M}", M, mk_i8d))

    only = os.environ.get("ONLY", "")
    for name, M, mk in cases:
        if only and only not in name:
            continue
        try:
            t = slope_time(mk)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}))
            continue
        gbps = w_bytes / t / 1e9
        flops = 2 * M * K * N
        mxu = flops / t / (MXU_BF16_TFLOPS * 1e12)
        r = {"variant": name, "M": M, "us": round(t * 1e6, 1),
             "weight_gbps": round(gbps, 1),
             "vs_hbm_sol": round(gbps / HBM_PEAK_GBPS, 3),
             "mxu_bf16_util": round(mxu, 3)}
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
