"""Fused NF4/FP4 dequantize + matmul — the hot kernel of the framework.

TPU-native equivalent of bitsandbytes' ``MatMul4Bit`` autograd function
(reference call-path: every LoRA-wrapped Linear4bit forward/backward in
/root/reference/qlora.py's training loop, SURVEY.md §3.3):

* forward:  ``y = x @ dequant(Wq)`` with the packed 4-bit weight staying
  packed in HBM; nibbles are decoded to bf16 inside VMEM tiles feeding the
  MXU.
* backward: ``dx = g @ dequant(Wq)ᵀ`` — the weight is re-dequantized (never
  stored), and the packed weight gets **no cotangent** (frozen base model).

Storage format (see qlora_tpu.quant.blockwise): global split-half packing —
packed byte ``(r, n)`` holds logical rows ``r`` (low nibble) and ``K/2 + r``
(high nibble).  The forward kernel reads each packed byte exactly once and
contracts both nibble-planes against two x tiles; all in-kernel tensors stay
2-D (Mosaic-friendly).

Two implementations share the storage format:

* ``impl="pallas"`` — tiled Pallas kernel, fp32 VMEM accumulator; runs in
  interpret mode on CPU for tests.
* ``impl="xla"``   — ``dequantize`` + ``jnp.dot``; the oracle and CPU path.
"""

from __future__ import annotations

import functools
import os
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qlora_tpu.quant.blockwise import (
    QuantizedTensor, absmax_f32, dequantize, logical_k,
)
from qlora_tpu.quant.codebooks import CODEBOOKS

Impl = Literal["auto", "pallas", "xla"]


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _decode_gather(idx_i32: jax.Array, tab_ref) -> jax.Array:
    """int32 code indices (0..15) → f32 codebook values via lane-gather.

    ``tab_ref`` holds the 16-entry codebook tiled along the 128 lanes and
    broadcast down the rows (same shape as ``idx``).  A same-shape
    ``take_along_axis(axis=1)`` lowers to one ``tpu.dynamic_gather`` per
    vreg (the source is a single vreg along lanes when the tile is 128 wide)
    — measured ~30× faster than a 15-step select chain on v5e.
    """
    return jnp.take_along_axis(tab_ref[:], idx_i32, axis=1)


def _scale_rows(v: jax.Array, am: jax.Array, block_size: int) -> jax.Array:
    """Multiply f32 values [R, C] by per-block scales am [R//B, C] along rows."""
    r, c = v.shape
    v3 = v.reshape(r // block_size, block_size, c)
    return (v3 * am[:, None, :]).reshape(r, c)


def _fwd_body(
    xl_ref, xh_ref, p_ref, aml_ref, amh_ref, tab_ref, o_ref, acc_ref,
    sc_ref, off_ref, *, block_size, n_slices, out_dtype,
):
    """One (i, j, k) grid step of y[M,N] = x[M,K] @ dequant(W)[K,N].

    k tiles the packed rows (= K/2 logical rows per nibble plane); both
    nibble planes of the tile are decoded and contracted against the
    matching low/high x tiles, so each packed byte is read once.

    The packed tile is DMA'd `n_slices`×128 lanes wide (long contiguous HBM
    rows — 128-byte rows crater DMA efficiency) and processed in 128-lane
    slices because the dynamic_gather decode needs a single-vreg-wide
    source.  The absmax arrives pre-reshaped to [steps, nb, N] and gridded
    (1, nb, TN) per nibble plane — nb is often not 8-aligned, so in-kernel
    dynamic row slicing would be illegal on TPU.  When sc_ref/off_ref are
    given, absmax is int8 and double-quant is undone in-kernel (per-column
    meta-scales — valid whenever K ≤ 16384).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tab = tab_ref[:]
    wls, whs = [], []
    for s in range(n_slices):
        sl = slice(s * 128, (s + 1) * 128)
        # bit-ops in int32: Mosaic can't legalize 8-bit logical shift (shrui)
        p32 = p_ref[:, sl].astype(jnp.int32)
        low = p32 & 0x0F
        high = p32 >> 4
        aml = aml_ref[0, :, sl]
        amh = amh_ref[0, :, sl]
        if sc_ref is not None:
            # double-quant fused in-kernel: int8 absmax · (scale/127) + offset
            sc = sc_ref[0, sl] * (1.0 / 127.0)
            off = off_ref[0, 0]
            aml = aml.astype(jnp.float32) * sc + off
            amh = amh.astype(jnp.float32) * sc + off
        wls.append(
            _scale_rows(jnp.take_along_axis(tab, low, axis=1), aml, block_size)
            .astype(jnp.bfloat16)
        )
        whs.append(
            _scale_rows(jnp.take_along_axis(tab, high, axis=1), amh, block_size)
            .astype(jnp.bfloat16)
        )
    wl = wls[0] if n_slices == 1 else jnp.concatenate(wls, axis=1)
    wh = whs[0] if n_slices == 1 else jnp.concatenate(whs, axis=1)
    acc_ref[:] += jnp.dot(
        xl_ref[:], wl, preferred_element_type=jnp.float32
    ) + jnp.dot(
        xh_ref[:], wh, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _qmm_fwd_kernel(xl, xh, p, aml, amh, tab, o, acc, **kw):
    _fwd_body(xl, xh, p, aml, amh, tab, o, acc, None, None, **kw)


def _qmm_fwd_kernel_dq(xl, xh, p, aml, amh, sc, off, tab, o, acc, **kw):
    _fwd_body(xl, xh, p, aml, amh, tab, o, acc, sc, off, **kw)


def _qmm_bwd_kernel(
    g_ref, p_ref, am_ref, tab_ref, o_ref, acc_ref,
    *, block_size, nj_half, n_slices, out_dtype,
):
    """One (i, j, k) grid step of dx[M,K] = g[M,N] @ dequant(W)[K,N]ᵀ.

    Grid: i over M tiles, j over logical-K output tiles, k over N tiles
    (contraction).  Output tile j lies entirely in the low (j < nj_half) or
    high nibble plane of the packed tile, selected per-step.  Wide DMA +
    128-lane decode slices, as in the forward kernel.
    """
    k = pl.program_id(2)
    j = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:]
    tab = tab_ref[:]
    for s in range(n_slices):
        sl = slice(s * 128, (s + 1) * 128)
        p32 = p_ref[:, sl].astype(jnp.int32)  # int32: 8-bit shrui won't legalize
        nib = jnp.where(j < nj_half, p32 & 0x0F, p32 >> 4)
        am = am_ref[0, :, sl]
        w = _scale_rows(jnp.take_along_axis(tab, nib, axis=1), am, block_size)
        acc_ref[:] += jax.lax.dot_general(
            g[:, sl],
            w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# w8a8 decode kernel: NF4 storage, int8 MXU compute (serving opt-in)
# ---------------------------------------------------------------------------
#
# The decode regime (small M) is bound by the MXU dot, whose cost at M≤128
# is one 128-row pass regardless of M; the int8 MXU runs at 2× the bf16
# rate, halving that floor.  Nibbles are decoded straight to int8 codes
# with the per-block absmax folded into a per-COLUMN scale:
#   w8[k,n] = round(code[idx] · absmax[kb,n] · 127 / colmax[n]) ∈ [-127,127]
# colmax[n] = max_kb absmax[kb,n] EXACTLY equals max_k |W[k,n]| because the
# block element that set the absmax quantizes to the ±1 code.  Activations
# are quantized per row (xs = rowmax/127).  Output:
#   y = (x8 @ w8) · xs[m] · (colmax[n]/127)
# Error ≈1.2% relative (int8 per-channel noise) — an OPT-IN decode path
# (never used for training); bf16 Pallas remains the default.


def _w8a8_fwd_kernel(
    xl_ref, xh_ref, p_ref, rl_ref, rh_ref, s_ref, tab_ref, o_ref, acc_ref,
    *, block_size, n_slices, out_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tab = tab_ref[:]
    xl = xl_ref[:]
    xh = xh_ref[:]
    for s in range(n_slices):
        sl = slice(s * 128, (s + 1) * 128)
        p32 = p_ref[:, sl].astype(jnp.int32)
        wl8 = jnp.round(_scale_rows(
            jnp.take_along_axis(tab, p32 & 0x0F, axis=1),
            rl_ref[0, :, sl], block_size)).astype(jnp.int8)
        wh8 = jnp.round(_scale_rows(
            jnp.take_along_axis(tab, p32 >> 4, axis=1),
            rh_ref[0, :, sl], block_size)).astype(jnp.int8)
        acc_ref[:, sl] += jax.lax.dot_general(
            xl, wl8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + jax.lax.dot_general(
            xh, wh8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * s_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "out_dtype")
)
def _qmm_pallas_w8a8(x, packed, am, shape, block_size, quant_type,
                     out_dtype=jnp.bfloat16):
    """y ≈ x @ dequant(packed, am) via int8 MXU (decode serving path)."""
    K, N = shape
    K2 = K // 2
    M = x.shape[0]
    code = CODEBOOKS[quant_type]

    # per-row activation quant (XLA side; negligible at decode M)
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    x8 = jnp.round(xf / xs).astype(jnp.int8)
    x8 = _pad_rows(x8, 32)          # int8 sublane tile
    Mp = x8.shape[0]

    # fold per-block absmax into per-column int8 scales
    col = jnp.max(am, axis=0)
    col = jnp.where(col == 0, 1.0, col)
    ratio = am * (127.0 / col)[None, :]
    s_out = (col / 127.0).reshape(1, N)

    TM = _pick_tile(Mp, (1024, 512, 256, 128, 64, 32))
    TKp = _pick_tile(K2, (1024, 512, 256, 128)) if TM <= 64 else _pick_tile(
        K2, (512, 256, 128))
    TN = _pick_tile(N, (512, 256, 128))
    grid = (Mp // TM, N // TN, K2 // TKp)
    nb = TKp // block_size
    koff = K2 // TKp
    r3 = ratio.reshape((K // block_size) // nb, nb, N)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))
    out = pl.pallas_call(
        functools.partial(
            _w8a8_fwd_kernel, block_size=block_size,
            n_slices=TN // 128, out_dtype=out_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k)),
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k + koff)),
            pl.BlockSpec((TKp, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k + koff, 0, j)),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j)),
            pl.BlockSpec((TKp, 128), lambda i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N // 2 + 4 * K * N // block_size + Mp * N * 2,
            transcendentals=0,
        ),
    )(x8, x8, packed, r3, r3, s_out, tab)
    out = out[:M] if Mp != M else out
    return out * xs.astype(out_dtype)


def _i8_direct_kernel(x8_ref, w8_ref, s_ref, o_ref, acc_ref, *, out_dtype):
    """int8×int8 MXU dot over pre-quantized per-column int8 weights — the
    decode-serving fast path.  No in-kernel decode: on v5e the decode VPU
    work (~40µs for a 4096² weight) dominates the M≤128 dot (21.8µs bf16 /
    10.9µs int8), so serving weights are requantized OFFLINE and read
    directly (measured: the binder becomes DMA at near-SOL)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x8_ref[:], w8_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * s_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("shape", "out_dtype"))
def _qmm_pallas_i8_direct(x, codes, col_scale, shape, out_dtype=jnp.bfloat16):
    """y ≈ x @ (codes · col_scale/127); codes int8 [K, N] per-column
    quantized (block_size=K), col_scale f32 [1, N]."""
    K, N = shape
    M = x.shape[0]
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    x8 = _pad_rows(jnp.round(xf / xs).astype(jnp.int8), 32)
    Mp = x8.shape[0]
    s_out = (col_scale.reshape(1, N) / 127.0).astype(jnp.float32)

    TM = _pick_tile(Mp, (512, 256, 128, 64, 32))
    # r5 on-chip sweep (M=128, 4096²): TN 512 → 1024/2048 lifts weight
    # streaming 0.81 → 0.92 of HBM SOL (wider N-contiguous DMA rows,
    # fewer tile boundaries); TK 2048 ≈ 1024 at TN ≥ 1024.  Big tiles
    # only in the decode regime (TM ≤ 256) where the VMEM budget
    # (2·TK·TN w + 4·TM·TN acc + x/out) stays ≤ ~10 MB.  Callers with
    # pallas-hostile N (e.g. a 32000-column lm_head would land on TN=128,
    # 128-byte DMA rows) should pad N to a multiple of 1024 at
    # requantize time — serve_int8._int8_lm_head does.
    if TM <= 256:
        TK = _pick_tile(K, (2048, 1024, 512, 256, 128))
        TN = _pick_tile(N, (1024, 512, 256, 128))
    else:
        TK = _pick_tile(K, (1024, 512, 256, 128))
        TN = _pick_tile(N, (512, 256, 128))
    ov = os.environ.get("QLORA_I8_TILES")   # "tk,tn" — A/B experiments only
    if ov:
        tko, tno = (int(v) for v in ov.split(","))
        TK = _pick_tile(K, (tko, 1024, 512, 256, 128))
        TN = _pick_tile(N, (tno, 512, 256, 128))
    grid = (Mp // TM, N // TN, K // TK)
    out = pl.pallas_call(
        functools.partial(_i8_direct_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N + Mp * N * 2,
            transcendentals=0,
        ),
    )(x8, codes, s_out)
    out = out[:M] if Mp != M else out
    return out * xs.astype(out_dtype)


# ---------------------------------------------------------------------------
# int8 kernels (--bits 8 path: unpacked blockwise-int8 weights)
# ---------------------------------------------------------------------------


def _i8_fwd_kernel(x_ref, p_ref, am_ref, o_ref, acc_ref, *, block_size,
                   out_dtype):
    """One (i, j, k) grid step of y = x @ dequant_int8(W); no nibble planes —
    codes are stored unpacked, decode is one convert + scale."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vals = p_ref[:].astype(jnp.float32) * (1.0 / 127.0)
    w = _scale_rows(vals, am_ref[0], block_size).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _i8_bwd_kernel(g_ref, p_ref, am_ref, o_ref, acc_ref, *, block_size,
                   out_dtype):
    """One (i, j, k) grid step of dx = g @ dequant_int8(W)ᵀ (contraction
    over N tiles)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vals = p_ref[:].astype(jnp.float32) * (1.0 / 127.0)
    w = _scale_rows(vals, am_ref[0], block_size).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "out_dtype")
)
def _qmm_pallas_i8(x, codes, am, shape, block_size, out_dtype=jnp.bfloat16):
    """y = x @ dequant(int8 codes, am); x [M, K] → [M, N]."""
    K, N = shape
    M = x.shape[0]
    xp = _pad_rows(x.astype(jnp.bfloat16), 16)
    Mp = xp.shape[0]
    TM = _pick_tile(Mp, (1024, 512, 256, 128, 64, 32, 16))
    TK = _pick_tile(K, (1024, 512, 256, 128)) if TM <= 64 else _pick_tile(
        K, (512, 256, 128))
    TN = 128 if TM <= 64 else _pick_tile(N, (512, 256, 128))

    grid = (Mp // TM, N // TN, K // TK)
    nb = TK // block_size
    am3 = am.reshape((K // block_size) // nb, nb, N)
    out = pl.pallas_call(
        functools.partial(
            _i8_fwd_kernel, block_size=block_size, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N + 4 * K * N // block_size + Mp * N * 2,
            transcendentals=0,
        ),
    )(xp, codes, am3)
    return out[:M] if Mp != M else out


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "out_dtype")
)
def _qmm_bwd_pallas_i8(g, codes, am, shape, block_size, out_dtype=jnp.bfloat16):
    """dx = g @ dequant(int8 codes, am)ᵀ; g [M, N] → [M, K]."""
    K, N = shape
    M = g.shape[0]
    gp = _pad_rows(g.astype(jnp.bfloat16), 16)
    Mp = gp.shape[0]
    TM = _pick_tile(Mp, (256, 128, 64, 32, 16))
    TK = _pick_tile(K, (512, 256, 128))
    TN = _pick_tile(N, (512, 256, 128))
    grid = (Mp // TM, K // TK, N // TN)
    nb = TK // block_size
    am3 = am.reshape((K // block_size) // nb, nb, N)
    out = pl.pallas_call(
        functools.partial(
            _i8_bwd_kernel, block_size=block_size, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK, TN), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (j, 0, k)),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, K), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * N * 2 + K * N + 4 * K * N // block_size + Mp * K * 2,
            transcendentals=0,
        ),
    )(gp, codes, am3)
    return out[:M] if Mp != M else out


def _pad_rows(x: jax.Array, mult: int) -> jax.Array:
    pad = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "out_dtype")
)
def _qmm_pallas(x, packed, am, shape, block_size, quant_type, out_dtype=jnp.bfloat16):
    """y = x @ dequant(packed, am); x [M, K] → [M, N]."""
    K, N = shape
    K2 = K // 2
    M = x.shape[0]
    code = CODEBOOKS[quant_type]

    xp = _pad_rows(x.astype(jnp.bfloat16), 16)
    Mp = xp.shape[0]
    # big TM amortizes the per-(j,k) decode over many rows of x
    TM = _pick_tile(Mp, (1024, 512, 256, 128, 64, 32, 16))
    # decode-bound small-M (serving): long K tiles (fewer grid steps) and
    # narrow TN (skip slice/concat relayouts); compute-bound large-M: the
    # WHOLE K2 per grid step (TKp=2048) with TN=256 overlaps decode and dot
    # best — measured r2 on v5e at M=1024/K=N=4096: 0.93-0.94 MFU vs 0.81
    # for TKp=512/TN=512 (TKp=1024/TN=512 and TN≥1024 fail to compile:
    # VMEM).  Mid-M keeps the r1 policy.
    if TM <= 64:
        TKp = _pick_tile(K2, (2048, 1024, 512, 256, 128))
        TN = 128
    elif TM >= 512 and K2 % 2048 == 0 and N % 256 == 0:
        TKp = 2048
        TN = 256
    else:
        TKp = _pick_tile(K2, (512, 256, 128))
        TN = _pick_tile(N, (512, 256, 128))

    grid = (Mp // TM, N // TN, K2 // TKp)
    nb = TKp // block_size          # absmax rows per tile
    koff = K2 // TKp                # high-half offset in x-tile / am-block units

    am_rows = K // block_size
    # [2*steps, nb, N]: low-plane step rows first, then high-plane rows;
    # gridding (1, nb, TN) sidesteps illegal unaligned dynamic row slices
    am3 = am.reshape(am_rows // nb, nb, N)
    # codebook tiled across lanes & rows; computed on device (never a jit
    # closure constant — those re-upload per dispatch through some runtimes)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))
    out = pl.pallas_call(
        functools.partial(
            _qmm_fwd_kernel, block_size=block_size,
            n_slices=TN // 128, out_dtype=out_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k)),           # x low cols
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k + koff)),    # x high cols
            pl.BlockSpec((TKp, TN), lambda i, j, k: (k, j)),           # packed
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k, 0, j)),      # absmax low
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k + koff, 0, j)),  # absmax high
            pl.BlockSpec((TKp, 128), lambda i, j, k: (0, 0)),          # codebook table
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + 4 * K * N // block_size + Mp * N * 2,
            transcendentals=0,
        ),
    )(xp, xp, packed, am3, am3, tab)
    return out[:M] if Mp != M else out


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "out_dtype")
)
def _qmm_pallas_dq(
    x, packed, am_q, am_sc, am_off, shape, block_size, quant_type,
    out_dtype=jnp.bfloat16,
):
    """Like _qmm_pallas, but absmax stays int8 and is dequantized in-kernel
    (requires per-column meta-scales, i.e. K // block_size ≤ 256)."""
    K, N = shape
    K2 = K // 2
    M = x.shape[0]
    code = CODEBOOKS[quant_type]

    TKp = _pick_tile(K2, (512, 256, 128))
    xp = _pad_rows(x.astype(jnp.bfloat16), 16)
    Mp = xp.shape[0]
    TM = _pick_tile(Mp, (1024, 512, 256, 128, 64, 32, 16))
    TN = 128 if TM <= 64 else _pick_tile(N, (512, 256, 128))

    grid = (Mp // TM, N // TN, K2 // TKp)
    nb = TKp // block_size
    koff = K2 // TKp
    am_rows = K // block_size
    am3 = am_q.reshape(am_rows // nb, nb, N)
    off2 = am_off.reshape(1, 1)
    tab = jnp.tile(jnp.asarray(code)[None, :], (TKp, 128 // 16))
    out = pl.pallas_call(
        functools.partial(
            _qmm_fwd_kernel_dq, block_size=block_size,
            n_slices=TN // 128, out_dtype=out_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k)),
            pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k + koff)),
            pl.BlockSpec((TKp, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (k + koff, 0, j)),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j)),             # meta-scale
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # offset
            pl.BlockSpec((TKp, 128), lambda i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + K * N // block_size + Mp * N * 2,
            transcendentals=0,
        ),
    )(xp, xp, packed, am3, am3, am_sc, off2, tab)
    return out[:M] if Mp != M else out


@functools.partial(
    jax.jit, static_argnames=("shape", "block_size", "quant_type", "out_dtype")
)
def _qmm_bwd_pallas(g, packed, am, shape, block_size, quant_type, out_dtype=jnp.bfloat16):
    """dx = g @ dequant(packed, am)ᵀ; g [M, N] → [M, K]."""
    K, N = shape
    K2 = K // 2
    M = g.shape[0]
    code = CODEBOOKS[quant_type]

    TK = _pick_tile(K2, (512, 256, 128))  # logical-K output tile (divides K/2)
    # DMA width (lane-sliced in-kernel).  TN=2048 skips straight past 1024:
    # r3 v5e ablation at M=1024/K=N=4096 (benchmarks/bwd_tile_ablation.py)
    # measured MFU 0.931 @ TN=2048 vs 0.778 @ 512 vs 0.769 @ 1024 — the
    # wide DMA halves the arbitrary-k grid steps per output tile while
    # 1024 only re-slices the same traffic.
    TN = _pick_tile(N, (2048, 512, 256, 128))
    gp = _pad_rows(g.astype(jnp.bfloat16), 16)
    Mp = gp.shape[0]
    # big TM amortizes the per-(j,k) decode (each byte decodes once per
    # M-tile): measured r2 on v5e at M=1024, TM 256→1024 lifts bwd MFU
    # 0.43→0.74; with TN=2048 (r3) bwd reaches 0.93
    TM = _pick_tile(Mp, (1024, 512, 256, 128, 64, 32, 16))

    nj_half = K2 // TK
    grid = (Mp // TM, K // TK, N // TN)
    nb = TK // block_size

    am_rows = K // block_size
    am3 = am.reshape(am_rows // nb, nb, N)  # logical-K step rows, grid-addressable
    tab = jnp.tile(jnp.asarray(code)[None, :], (TK, 128 // 16))
    out = pl.pallas_call(
        functools.partial(
            _qmm_bwd_kernel,
            block_size=block_size, nj_half=nj_half,
            n_slices=TN // 128, out_dtype=out_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, j, k: (i, k)),            # g
            pl.BlockSpec((TK, TN), lambda i, j, k: (j % nj_half, k)),  # packed
            pl.BlockSpec((1, nb, TN), lambda i, j, k: (j, 0, k)),      # absmax
            pl.BlockSpec((TK, 128), lambda i, j, k: (0, 0)),           # codebook table
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, K), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * N * 2 + K * N + 4 * K * N // block_size + Mp * K * 2,
            transcendentals=0,
        ),
    )(gp, packed, am3, tab)
    return out[:M] if Mp != M else out


def _supports_pallas_tiles(K: int, N: int, quant_type: str = "nf4") -> bool:
    if quant_type == "int8":
        return K % 128 == 0 and N % 128 == 0
    # K/2 and N must both be tileable to the 128-lane minimum
    return K % 256 == 0 and N % 128 == 0


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def qmatmul(x: jax.Array, qt: QuantizedTensor, impl: Impl = "auto") -> jax.Array:
    """``x @ dequant(qt)`` for 2-D x [M, K] → [M, N] (bf16 out, fp32 accum).

    Differentiable in x only; the quantized weight is frozen (matches the
    reference's MatMul4Bit: no weight gradient, re-dequantize in backward).
    """
    return _qmm_forward(x, qt, impl)


_IMPL_OVERRIDE: list = [None]


def set_default_impl(impl: Optional[str]) -> None:
    """Override 'auto' resolution globally (trace-time).

    Use "xla" before jit-ing a GSPMD multi-device program: XLA can partition
    the dequant+dot graph automatically, whereas a pallas_call would be
    wrapped in all-gathers.  (Multi-chip pallas runs via shard_map instead.)
    "w8a8" opts the forward into the int8-MXU decode kernel (serving only).
    """
    _IMPL_OVERRIDE[0] = impl


import contextlib as _contextlib


@_contextlib.contextmanager
def default_impl(impl: Optional[str]):
    """Scoped set_default_impl (serving engines wrap decode steps in
    default_impl("w8a8") to halve the MXU floor — see _qmm_pallas_w8a8)."""
    prev = _IMPL_OVERRIDE[0]
    _IMPL_OVERRIDE[0] = impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE[0] = prev


def _resolve_impl(impl: Impl, K, N, quant_type: str = "nf4") -> str:
    if impl == "auto":
        if _IMPL_OVERRIDE[0] is not None:
            impl = _IMPL_OVERRIDE[0]
            if impl != "pallas":
                return impl
        return "pallas" if _supports_pallas_tiles(K, N, quant_type) else "xla"
    return impl


def _dq_fusable(qt: QuantizedTensor) -> bool:
    """In-kernel double-quant undo needs one meta-block per column."""
    return (
        qt.double_quant
        and qt.absmax_scale.shape[0] == 1
        and qt.absmax.shape[0] >= 8  # int8 sublane tiling floor
    )


def _absmax_f32_local(qt: QuantizedTensor, K: int, N: int):
    """absmax_f32 computed against leaf-derived (possibly sharded) dims."""
    from qlora_tpu.quant.blockwise import dequantize_absmax

    target = (K // qt.block_size, N)
    if qt.double_quant:
        return dequantize_absmax(qt.absmax, qt.absmax_scale, qt.absmax_offset, target)
    return qt.absmax.astype(jnp.float32)


def _qmm_forward(x, qt, impl):
    # derive dims from the leaves, not qt.shape metadata: under shard_map the
    # leaves are per-device shards and the static shape describes the global
    K, N = logical_k(qt), qt.packed.shape[1]
    if qt.k_shards > 1:
        # global view of a K-sharded (per-chunk-packed) tensor: only the
        # chunk-aware dequant path understands the layout.  Per-shard use
        # goes through blockwise.local_chunk, which restores the kernels.
        w = dequantize(qt, dtype=jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    resolved = _resolve_impl(impl, K, N, qt.quant_type)
    if resolved == "w8a8" and K % 128 == 0 and N % 128 == 0:
        if qt.quant_type == "int8" and qt.block_size == K:
            # per-column int8 serving weights → direct int8 MXU dot
            col = _absmax_f32_local(qt, K, N)
            return _qmm_pallas_i8_direct(
                x, qt.packed, col, (K, N), out_dtype=jnp.bfloat16,
            )
        if qt.quant_type in ("nf4", "fp4") and _supports_pallas_tiles(K, N):
            return _qmm_pallas_w8a8(
                x, qt.packed, _absmax_f32_local(qt, K, N), (K, N),
                qt.block_size, qt.quant_type, out_dtype=jnp.bfloat16,
            )
    if resolved == "w8a8":
        resolved = ("pallas"
                    if _supports_pallas_tiles(K, N, qt.quant_type) else "xla")
    if resolved == "pallas":
        if qt.quant_type == "int8":
            am = _absmax_f32_local(qt, K, N)
            return _qmm_pallas_i8(
                x, qt.packed, am, (K, N), qt.block_size,
                out_dtype=jnp.bfloat16,
            )
        if _dq_fusable(qt):
            return _qmm_pallas_dq(
                x, qt.packed, qt.absmax, qt.absmax_scale, qt.absmax_offset,
                (K, N), qt.block_size, qt.quant_type, out_dtype=jnp.bfloat16,
            )
        am = _absmax_f32_local(qt, K, N)
        return _qmm_pallas(
            x, qt.packed, am, (K, N), qt.block_size, qt.quant_type,
            out_dtype=jnp.bfloat16,
        )
    w = dequantize(qt, dtype=jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )


def _qmm_fwd_rule(x, qt, impl):
    return _qmm_forward(x, qt, impl), qt


def _qmm_bwd_rule(impl, qt, g):
    K, N = logical_k(qt), qt.packed.shape[1]
    resolved = ("xla" if qt.k_shards > 1
                else _resolve_impl(impl, K, N, qt.quant_type))
    if resolved == "w8a8":  # the int8 path is forward/serving-only
        resolved = ("pallas"
                    if _supports_pallas_tiles(K, N, qt.quant_type) else "xla")
    if resolved == "pallas":
        am = _absmax_f32_local(qt, K, N)
        if qt.quant_type == "int8":
            dx = _qmm_bwd_pallas_i8(
                g, qt.packed, am, (K, N), qt.block_size,
                out_dtype=jnp.bfloat16,
            )
        else:
            dx = _qmm_bwd_pallas(
                g, qt.packed, am, (K, N), qt.block_size, qt.quant_type,
                out_dtype=jnp.bfloat16,
            )
    else:
        w = dequantize(qt, dtype=jnp.bfloat16)
        dx = jnp.dot(
            g.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
    # frozen weight: zero cotangent (float0 for integer leaves)
    dqt = jax.tree_util.tree_map(
        lambda p: (
            np.zeros(p.shape, jax.dtypes.float0)
            if not jnp.issubdtype(p.dtype, jnp.floating)
            else jnp.zeros_like(p)
        ),
        qt,
    )
    return dx, dqt


qmatmul.defvjp(_qmm_fwd_rule, _qmm_bwd_rule)
