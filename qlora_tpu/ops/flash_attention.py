"""Flash attention for TPU — online-softmax tiled kernel with custom VJP.

Built from scratch per the TPU kernel playbook (blockwise tiling, fp32
softmax statistics in VMEM scratch, causal tile-skip, −0.7·f32max mask
value).  The reference framework has no attention kernel of its own (it
inherits torch SDPA from transformers); this is the TPU-native hot-path
replacement, used by qlora_tpu.models when sequences are long enough to
benefit.

Layout: q [B, H, Sq, D], k/v [B, H, Skv, D] (heads leading — each (b, h)
grid cell is an independent attention problem; GQA is handled by the caller
repeating KV heads or by head-grouping before the call).

Backward follows the standard two-kernel scheme (dq kernel + dkv kernel)
with a single FlashAttention-2-style lse = m + log(l) residual and
di = Σ o·do precomputed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
MIN_BLOCK = 128
_LOG2E = 1.4426950408889634   # log2(e): softmax runs in the exp2 domain
_LN2 = 0.6931471805599453     # ln(2): converts log2-domain m back for lse


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick(n, cands=(512, 256, 128)):
    for c in cands:
        if n % c == 0:
            return c
    return n


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _lane_rep(x, width):
    """Expand lane-replicated stats [bq, 128] to [bq, width]."""
    if width == 128:
        return x
    if width < 128:
        return x[:, :width]
    return jnp.tile(x, (1, width // 128))


def _fwd_kernel(
    q_ref, k_ref, v_ref, kvlen_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, causal, block_q, block_k, kv_len, window, exp2=False,
    split_k=1,
):
    """Grid (B, H, Sq/block_q, Skv/block_k); online softmax over kv tiles.

    All softmax statistics (m/l) live LANE-REPLICATED in [bq, 128] scratch:
    narrow [bq, 1] stat vregs force a Mosaic relayout on every max/exp/
    rescale and serialized the whole kernel at 0.27 MFU on v5e; the
    replicated layout ran the same shape at 0.47 MFU; round 4's deferred
    normalization (FA2-style: acc rescaled by alpha only, divided by l
    once at the last kv tile) plus 1024-wide q tiles reached 0.55-0.62,
    and split_k=2 sub-tiling + exp2 lifted it to 0.63/0.66 at S=2048/4096
    (vs jax.experimental's reference kernel at 0.41).
    """
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    bi = pl.program_id(0)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal tile skip: run only if some column in this kv tile is <= some row
    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        # tile fully outside the window (all cols < min row - window + 1)
        run = run & ((ki + 1) * block_k - 1 >= qi * block_q - window + 1)

    # exp2 mode: fold sm_scale·log2(e) into the ONE post-dot multiply and
    # exponentiate with exp2 directly — jnp.exp lowers to a multiply by
    # log2e plus exp2 on the VPU, so this removes one f32 multiply per
    # [bq, bk] element from the softmax critical path.  m/l/alpha then
    # live in the log2 domain; the final o = acc/l is domain-free and the
    # lse residual converts back with one [bq, 128] multiply.
    scale_eff = sm_scale * _LOG2E if exp2 else sm_scale
    expf = jnp.exp2 if exp2 else jnp.exp

    @pl.when(run)
    def _():
        # dots run on the INPUT dtype (bf16 in production → full-rate MXU)
        # with f32 accumulation; sm_scale is applied to s in f32
        q = q_ref[0, 0]                                       # [bq, d]
        # split_k > 1 processes the kv tile as independent SUB-tiles: the
        # next sub-tile's s-dot (MXU) has no data dependence on the current
        # sub-tile's softmax (VPU), giving the Mosaic scheduler independent
        # chains to overlap (ablation knob; production value set below)
        bs = block_k // split_k
        for sub in range(split_k):
            k = k_ref[0, 0][sub * bs:(sub + 1) * bs, :]       # [bs, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale_eff                                     # [bq, bs] f32

            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + qi * block_q)
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ki * block_k + sub * bs)
            mask = col < kvlen_ref[bi, 0]                     # padding mask
            if causal:
                mask = mask & (col <= row)
            if window is not None:
                mask = mask & (row - col < window)
            s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_scr[:], l_scr[:]               # [bq, 128]
            m_curr = jnp.max(s, axis=1)[:, None]              # [bq, 1]
            m_next = jnp.maximum(m_prev, m_curr)              # [bq, 128]
            alpha = expf(m_prev - m_next)
            p = expf(s - _lane_rep(m_next, s.shape[1]))
            l_next = (jnp.sum(p, axis=1)[:, None]
                      + alpha * l_prev)                       # [bq, 128]
            m_scr[:] = m_next
            l_scr[:] = l_next

            v = v_ref[0, 0][sub * bs:(sub + 1) * bs, :]       # [bs, d]
            # FA2-style DEFERRED normalization: acc carries the unnormalized
            # numerator (rescaled by alpha only) and is divided by l ONCE at
            # the last kv tile — the old running-l normalization burned two
            # extra [bq, d] VPU multiplies per tile on the s→p→pv critical
            # path (p ≤ 1 and acc ≤ l ≤ Skv, so f32 cannot overflow)
            acc_scr[:] *= _lane_rep(alpha, acc_scr.shape[1])
            acc_scr[:] += jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        # Fully-masked (empty) row detection: masking is ADDITIVE
        # (s + MASK), so even an empty row has l >= 1 (its own max
        # exponentiates to 1) and acc holds a garbage softmax of the masked
        # scores.  The reliable signature is the running max sitting at the
        # mask floor: real scores satisfy |s| << |MASK|/2, so
        # m <= MASK/2 <=> no unmasked column was ever seen.  Empty rows
        # emit o = 0 and lse = +3e38 (the documented sentinel; backward's
        # exp(s - lse) then underflows to 0, giving exact zero grads).
        empty = m_scr[:] <= DEFAULT_MASK_VALUE * 0.5          # [bq, 128]
        l_fin = l_scr[:]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, 0] = jnp.where(
            _lane_rep(empty, acc_scr.shape[1]), 0.0,
            acc_scr[:] * _lane_rep(l_inv, acc_scr.shape[1])
        ).astype(o_ref.dtype)
        # single FlashAttention-2-style residual: lse = m + log(l) — halves
        # the stats HBM traffic vs separate l/m (the [B,H,S,128] f32 writes
        # were ~30% of fwd kernel time at S=2048).  Inference fwd calls
        # skip the residual entirely (lse_ref None): pallas outputs cannot
        # be DCE'd, and the [B,H,S,128] f32 write is ~13% of the call's
        # HBM traffic — measured 0.544 -> 0.585 MFU at S=2048 on v5e.
        if lse_ref is not None:
            # exp2 mode tracks m in the log2 domain; the residual stays in
            # the NAT domain (ring-attention merges and the vjp expect it)
            m_nat = m_scr[:] * _LN2 if exp2 else m_scr[:]
            lse_ref[0, 0] = jnp.where(
                empty, 3e38, m_nat + jnp.log(l_scr[:])
            )


def _fwd_kernel_nolse(q_ref, k_ref, v_ref, kvlen_ref, o_ref,
                      m_scr, l_scr, acc_scr, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, kvlen_ref, o_ref, None,
                m_scr, l_scr, acc_scr, **kw)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "causal", "block_q", "block_k",
                              "window", "with_lse", "use_exp2", "split_k")
)
def _flash_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q, block_k,
               window=None, with_lse=True, use_exp2=True, split_k=2):
    # production default use_exp2=True + split_k=2 (r4 v5e ablation,
    # benchmarks/flash_exp2_ablate.py): sub-tiling the kv tile gives the
    # Mosaic scheduler an independent MXU chain (next sub-tile's s-dot) to
    # overlap with the current sub-tile's VPU softmax — 0.587 → 0.628 MFU
    # at S=2048, 0.608 → 0.663 at S=4096.  exp2 alone is a WASH (−0.01:
    # Mosaic already folds the multiply into exp) but adds +0.008-0.014 on
    # top of split_k=2 once the VPU is the exposed critical path; split_k=8
    # collapses to 0.46 (scheduling/VMEM pressure).
    B, H, Sq, D = q.shape
    KVH = k.shape[1]
    G = H // KVH          # GQA: query heads per kv head (kernel-side grouping)
    Skv = k.shape[2]
    # honor the requested tile when it divides the sequence (tiles > 512
    # are legitimate — the ablation sweeps them); shrink only on mismatch
    bq = block_q if Sq % block_q == 0 else min(block_q, _pick(Sq))
    bk = block_k if Skv % block_k == 0 else min(block_k, _pick(Skv))
    grid = (B, H, Sq // bq, Skv // bk)

    o_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0))
    o_shape = jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype)
    kern = functools.partial(
        _fwd_kernel if with_lse else _fwd_kernel_nolse,
        sm_scale=sm_scale, causal=causal,
        block_q=bq, block_k=bk, kv_len=Skv, window=window, exp2=use_exp2,
        split_k=split_k if bk % split_k == 0 else 1,
    )
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h // G, j, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h // G, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[o_spec] + ([
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, i, j: (b, h, i, 0)),
        ] if with_lse else []),
        out_shape=[o_shape] + ([
            jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),
        ] if with_lse else []),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(q, k, v, kv_lengths.reshape(-1, 1))
    if with_lse:
        return res
    return res[0], None


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, kvlen_ref, do_ref, lse_ref, di_ref, dq_ref,
    dq_scr,
    *, sm_scale, causal, block_q, block_k, window, exp2=False, split_k=1,
):
    """dq: grid (B, H, Sq/bq, Skv/bk), accumulate over kv tiles.

    split_k sub-tiles the kv tile (see _fwd_kernel): with lse PRECOMPUTED
    the sub-tiles are fully independent, so each sub-tile's exp (VPU)
    overlaps the next one's s-dot (MXU)."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    bi = pl.program_id(0)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        # window tile-skip (matches forward): sliding-window training pays
        # O(S·window) backward, not full-quadratic
        run = run & ((ki + 1) * block_k - 1 >= qi * block_q - window + 1)

    scale_eff = sm_scale * _LOG2E if exp2 else sm_scale
    expf = jnp.exp2 if exp2 else jnp.exp

    @pl.when(run)
    def _():
        # bf16 MXU operands, f32 accumulation/statistics (same rationale as
        # the forward kernel; s recomputation matches fwd bit-for-bit)
        q = q_ref[0, 0]                                        # bf16
        do = do_ref[0, 0]                                      # bf16
        # exp2 domain: one [bq, 128] multiply moves lse to log2 before the
        # lane replication; p = exp2(s·c − lse·log2e) equals exp(s·a − lse)
        lse_dom = (lse_ref[0, 0] * _LOG2E) if exp2 else lse_ref[0, 0]
        bs = block_k // split_k
        for sub in range(split_k):
            k = k_ref[0, 0][sub * bs:(sub + 1) * bs, :]
            v = v_ref[0, 0][sub * bs:(sub + 1) * bs, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale_eff
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + qi * block_q)
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ki * block_k + sub * bs)
            mask = col < kvlen_ref[bi, 0]
            if causal:
                mask = mask & (col <= row)
            if window is not None:
                mask = mask & (row - col < window)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            # lane-replicated [bq, 128] lse (see _fwd_kernel): narrow
            # [bq, 1] slices forced per-op relayouts and dominated the
            # kernel time; p = exp(s - lse) is the normalized softmax
            bkw = s.shape[1]
            p = expf(s - _lane_rep(lse_dom, bkw))
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            di = _lane_rep(di_ref[0, 0], bkw)
            ds = (p * (dp - di) * sm_scale).astype(k.dtype)
            dq_scr[:] += jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, kvlen_ref, do_ref, lse_ref, di_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, causal, block_q, block_k, window, exp2=False, split_k=1,
):
    """dk/dv: grid (B, H, Skv/bk, Sq/bq), accumulate over q tiles.

    split_k here sub-tiles the Q tile (rows of the [bq, bk] score block):
    lse/di are per-row, so row sub-tiles are fully independent chains."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    bi = pl.program_id(0)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        # window tile-skip (matches forward)
        run = run & ((ki + 1) * block_k - 1 >= qi * block_q - window + 1)

    scale_eff = sm_scale * _LOG2E if exp2 else sm_scale
    expf = jnp.exp2 if exp2 else jnp.exp

    @pl.when(run)
    def _():
        # bf16 MXU operands, f32 accumulation (see forward kernel)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        lse_dom = (lse_ref[0, 0] * _LOG2E) if exp2 else lse_ref[0, 0]
        bs = block_q // split_k
        for sub in range(split_k):
            q = q_ref[0, 0][sub * bs:(sub + 1) * bs, :]        # bf16
            do = do_ref[0, 0][sub * bs:(sub + 1) * bs, :]      # [bs, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale_eff
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + qi * block_q + sub * bs)
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ki * block_k)
            mask = col < kvlen_ref[bi, 0]
            if causal:
                mask = mask & (col <= row)
            if window is not None:
                mask = mask & (row - col < window)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            # lane-replicated lse (see _fwd_kernel / _bwd_dq_kernel)
            bkw = s.shape[1]
            pf = expf(s - _lane_rep(lse_dom[sub * bs:(sub + 1) * bs], bkw))
            p = pf.astype(q.dtype)                             # [bs, bk]
            # dv += P^T @ do
            dv_scr[:] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            di = _lane_rep(di_ref[0, 0][sub * bs:(sub + 1) * bs], bkw)
            ds = (pf * (dp - di) * sm_scale).astype(q.dtype)   # [bs, bk]
            # dk += dS^T @ q  (q is unscaled here, so no final /sm_scale)
            dk_scr[:] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            )

    @pl.when(qi == pl.num_programs(3) - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "causal", "block_q", "block_k",
                              "window", "use_exp2", "split_k")
)
def _flash_bwd(q, k, v, kv_lengths, o, lse, do, sm_scale, causal, block_q,
               block_k, window=None, dlse=None, use_exp2=True, split_k=2):
    # production default use_exp2=True + split_k=2, same rationale as
    # _flash_fwd (lse is precomputed here, so sub-tiles are FULLY
    # independent): bwd-only 0.693 → 0.710 MFU at S=2048 on v5e
    # (benchmarks/flash_exp2_ablate.py --bwd; split_k=4 regresses to 0.684)
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    # honor the requested tile when it divides the sequence (tiles > 512
    # are legitimate — the ablation sweeps them); shrink only on mismatch
    bq = block_q if Sq % block_q == 0 else min(block_q, _pick(Sq))
    bk = block_k if Skv % block_k == 0 else min(block_k, _pick(Skv))

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    if dlse is not None:
        # lse-cotangent folds into the di term: ds = p·(dp − (di − dlse))
        # (∂lse/∂s_j = p_j) — the kernels stay unchanged
        di = di - dlse.astype(jnp.float32)
    di = jnp.broadcast_to(di[..., None], (*di.shape, 128))  # lane-broadcast

    common_in = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),   # q
        pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),   # k
        pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),   # v
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),   # do
        pl.BlockSpec((1, 1, bq, 128), lambda b, h, i, j: (b, h, i, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 128), lambda b, h, i, j: (b, h, i, 0)),  # di
    ]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
            block_q=bq, block_k=bk, window=window, exp2=use_exp2,
            split_k=split_k if bk % split_k == 0 else 1,
        ),
        grid=(B, H, Sq // bq, Skv // bk),
        in_specs=common_in,
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(q, k, v, kv_lengths.reshape(-1, 1), do, lse, di)

    swapped_in = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i: (b, h, i, 0)),   # q
        pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),   # k
        pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),   # v
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i: (b, h, i, 0)),   # do
        pl.BlockSpec((1, 1, bq, 128), lambda b, h, j, i: (b, h, i, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 128), lambda b, h, j, i: (b, h, i, 0)),  # di
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
            block_q=bq, block_k=bk, window=window, exp2=use_exp2,
            split_k=split_k if bq % split_k == 0 else 1,
        ),
        grid=(B, H, Skv // bk, Sq // bq),
        in_specs=swapped_in,
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Skv, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Skv, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(q, k, v, kv_lengths.reshape(-1, 1), do, lse, di)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(
    q: jax.Array,               # [B, H, Sq, D]
    k: jax.Array,               # [B, KVH, Skv, D] (KVH may divide H: GQA)
    v: jax.Array,
    kv_lengths: jax.Array,      # [B] int32 — keys >= length are masked
    sm_scale: float = 1.0,
    causal: bool = True,
    block_q: int = 1024,  # r4 v5e ablation (D=128, deferred-norm), WALL
    block_k: int = 1024,  # CLOCK per call: 1024/1024 wins at S=2048
                          # (0.927 ms vs 0.959 at /512, 0.954 old 512/512)
                          # and S=4096 (2.907 vs 3.001) — bigger tiles
                          # amortize the VPU softmax against more MXU work
    window: int | None = None,  # Mistral-style sliding window
) -> jax.Array:
    # primal (inference) path: skip the lse residual output — the vjp fwd
    # rule below recomputes with with_lse=True when grads are needed
    out, _ = _flash_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q,
                        block_k, window, with_lse=False)
    return out


def _fa_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q, block_k, window):
    out, lse = _flash_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q,
                           block_k, window)
    return out, (q, k, v, kv_lengths, out, lse)


def _fa_bwd(sm_scale, causal, block_q, block_k, window, res, do):
    q, k, v, kv_lengths, o, lse = res
    H = q.shape[1]
    KVH = k.shape[1]
    if KVH != H:
        # backward runs per query head on repeated KV, then dk/dv sum over
        # each kv head's query group
        G = H // KVH
        kr = jnp.repeat(k, G, axis=1)
        vr = jnp.repeat(v, G, axis=1)
        dq, dkr, dvr = _flash_bwd(
            q, kr, vr, kv_lengths, o, lse, do, sm_scale, causal,
            block_q, block_k, window,
        )
        B, _, Skv, D = k.shape
        dk = dkr.reshape(B, KVH, G, Skv, D).sum(axis=2).astype(k.dtype)
        dv = dvr.reshape(B, KVH, G, Skv, D).sum(axis=2).astype(v.dtype)
        return dq, dk, dv, None
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_lengths, o, lse, do, sm_scale, causal, block_q, block_k,
        window,
    )
    return dq, dk, dv, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention_lse(
    q, k, v, kv_lengths, sm_scale=1.0, causal=True, block_q=1024,
    block_k=1024, window=None,
):
    """flash_attention that ALSO returns lse [B, H, Sq] (m + log l per row;
    fully-masked rows hold +3e38 — treat as -inf when merging).

    Differentiable in q/k/v INCLUDING the lse output: the lse cotangent
    folds into the backward kernels' di term (ds = p·(dp − (di − dlse))).
    Ring attention uses this to merge per-chunk partials exactly.
    """
    out, lse = _flash_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q,
                          block_k, window)
    return out, lse[..., 0]


def _fal_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q, block_k, window):
    out, lse = _flash_fwd(q, k, v, kv_lengths, sm_scale, causal, block_q,
                          block_k, window)
    return (out, lse[..., 0]), (q, k, v, kv_lengths, out, lse)


def _fal_bwd(sm_scale, causal, block_q, block_k, window, res, cts):
    do, dlse = cts
    q, k, v, kv_lengths, o, lse = res
    H = q.shape[1]
    KVH = k.shape[1]
    if KVH != H:
        G = H // KVH
        kr = jnp.repeat(k, G, axis=1)
        vr = jnp.repeat(v, G, axis=1)
        dq, dkr, dvr = _flash_bwd(
            q, kr, vr, kv_lengths, o, lse, do, sm_scale, causal,
            block_q, block_k, window, dlse=dlse,
        )
        B, _, Skv, D = k.shape
        dk = dkr.reshape(B, KVH, G, Skv, D).sum(axis=2).astype(k.dtype)
        dv = dvr.reshape(B, KVH, G, Skv, D).sum(axis=2).astype(v.dtype)
        return dq, dk, dv, None
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_lengths, o, lse, do, sm_scale, causal, block_q, block_k,
        window, dlse=dlse,
    )
    return dq, dk, dv, None


flash_attention_lse.defvjp(_fal_fwd, _fal_bwd)


def attention_reference(q, k, v, kv_lengths, sm_scale=1.0, causal=True,
                        window=None):
    """jnp oracle with identical masking semantics (fp32 softmax)."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    col = jnp.arange(Skv)[None, None, None, :]
    mask = col < kv_lengths[:, None, None, None]
    row = jnp.arange(Sq)[None, None, :, None]
    if causal:
        mask = mask & (col <= row)
    if window is not None:
        mask = mask & (row - col < window)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
