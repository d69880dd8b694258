"""Fused decode attention over the CONTIGUOUS KV cache.

The decode step's binder was never the weight kernel: the round-3 profile
(docs/DESIGN.md §6c) showed ~19 ms of a 47.6 ms 7B B=32 step going to
dynamic-slice/bitcast glue around the cache update (a vmap'd
dynamic_update_slice lowers to a scatter that rewrites the 100 MB/layer
buffer) plus VPU-bound masked-softmax glue over the full static buffer.

This kernel fuses the whole decode-attention step — cache append AND
masked online-softmax attention — into one pallas_call per layer:

* the caches are ALIASED outputs (`input_output_aliases`): the new token's
  K/V are DMA'd into position `length[b]` in place; no scatter, no copy of
  the cache buffer;
* KV chunks stream HBM→VMEM through the automatic grid pipeline with the
  chunk index CLAMPED via scalar-prefetch index maps — chunks past the
  row's `length` map to the same block id, and the pipeline elides
  repeated fetches, so each step reads ≈`length` tokens, not the full
  static capacity;
* the new token never round-trips through HBM: its attention contribution
  is merged analytically into the online-softmax state from VMEM.

Cache layout is [B, KVH, T, hd] (KV-head major) so each (batch, kv-head)
stream is a contiguous [T, hd] slab — wide, layout-free DMA.  GQA is
grouped inside the kernel (one [G, Tc] logits tile per kv head).

Reference stake: the decode path of the serving engine rebuilt from the
reference's generate()/bnb 4-bit stack (SURVEY.md N14); the reference
itself admits 4-bit inference is slow (README.md:135) — this kernel is
where the TPU rebuild beats it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(
    # scalar prefetch
    lengths_ref,                       # [B] int32
    # inputs
    q_ref,                             # [1, KVH, G, hd]
    nk_ref,                            # [1, 1, KVH, hd] — token axis LEADS:
    nv_ref,                            #   slicing a bf16 VMEM ref to size 1
                                       #   along the sublane-packed dim is
                                       #   illegal (Mosaic tiling (2,128));
                                       #   with [KVH, hd] minor the DMA
                                       #   source needs no sub-tile slice
    k_ref,                             # [1, KVH, Tc, hd] pipelined chunk
    v_ref,
    # outputs
    o_ref,                             # [1, KVH, G, hd]
    ko_ref,                            # [B, KVH, T, hd] ANY (aliased cache)
    vo_ref,
    # scratch
    m_s,                               # [KVH, G, LANES] f32 running max
    l_s,                               # [KVH, G, LANES] f32 running sum
    acc_s,                             # [KVH, G, hd]   f32 running numerator
    tok_k,                             # [KVH, 8, hd] — aligned append window
    tok_v,
    sem,                               # DMA(4) — append window rd/wr × k/v
    *,
    chunk: int,
    sm_scale: float,
    sliding_window,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    length = lengths_ref[b]
    KVH, G = q_ref.shape[1], q_ref.shape[2]
    # Mosaic forbids slicing the sublane-tiled T axis to size 1 (bf16 tile
    # (8,128)), so the append is a read-modify-write of the ALIGNED 8-token
    # window holding position `length`; the read starts at c == 0 and its
    # latency hides behind the chunk-compute loop.  PRECONDITION:
    # length < T (see the host wrapper) — the window start is clamped so a
    # capacity-boundary caller rewrites the last in-bounds window instead
    # of reading past the cache
    T_cache = ko_ref.shape[2]
    aligned = pl.multiple_of(
        jnp.minimum((length // 8) * 8, T_cache - 8), 8)

    @pl.when(c == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, MASK)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)
        pltpu.make_async_copy(
            ko_ref.at[b, :, pl.ds(aligned, 8), :], tok_k, sem.at[0]
        ).start()
        pltpu.make_async_copy(
            vo_ref.at[b, :, pl.ds(aligned, 8), :], tok_v, sem.at[1]
        ).start()

    # the pipeline clamps the chunk INDEX for c past the row's length (see
    # index maps below); position arithmetic must match the data actually
    # loaded, so recompute the clamped base here — and REPEAT visits to the
    # clamped chunk must contribute nothing (only the first visit counts,
    # else the last chunk's scores are double-added)
    last_chunk = length // chunk
    base = jnp.minimum(c, last_chunk) * chunk
    first_visit = c <= last_chunk

    for h in range(KVH):               # static: KVH small (1-8 per shard)
        qh = q_ref[0, h]               # [G, hd] bf16
        kh = k_ref[0, h]               # [Tc, hd] bf16
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                   # [G, Tc]
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = (pos < length) & first_visit
        if sliding_window is not None:
            # query sits at position `length`; HF semantics keep keys with
            # qpos - kpos < window
            valid &= pos > length - sliding_window
        s = jnp.where(valid, s, MASK)

        # online softmax with LANE-REPLICATED stats (narrow [G, 1] stat
        # vregs force Mosaic relayouts — flash_attention.py's lesson)
        m_prev = m_s[h]                                   # [G, LANES]
        row_max = jnp.max(s, axis=1, keepdims=True)       # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)                   # [G, LANES]
        p = jnp.exp(s - m_new[:, :1])                     # [G, Tc]
        l_s[h] = l_s[h] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), m_prev.shape)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0, h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )                                                 # [G, hd]
        acc_s[h] = acc_s[h] * alpha[:, : acc_s.shape[-1]] + pv
        m_s[h] = m_new

    @pl.when(c == nc - 1)
    def _finalize():
        # merge the new token's contribution straight from VMEM (it is
        # never read back from HBM this step), then normalize and emit
        for h in range(KVH):
            qh = q_ref[0, h].astype(jnp.float32)          # [G, hd]
            nk = nk_ref[0, 0, h].astype(jnp.float32)      # [hd]
            nv = nv_ref[0, 0, h].astype(jnp.float32)
            s_new = jnp.sum(qh * nk[None, :], axis=1, keepdims=True) \
                * sm_scale                                # [G, 1]
            m_prev = m_s[h]
            m_f = jnp.maximum(m_prev, jnp.broadcast_to(s_new, m_prev.shape))
            alpha = jnp.exp(m_prev - m_f)
            p_new = jnp.exp(jnp.broadcast_to(s_new, m_prev.shape) - m_f)
            l_f = l_s[h] * alpha + p_new
            hd = acc_s.shape[-1]
            num = acc_s[h] * alpha[:, :hd] + p_new[:, :hd] * nv[None, :]
            den = jnp.where(l_f[:, :hd] == 0.0, 1.0, l_f[:, :hd])
            o_ref[0, h] = (num / den).astype(o_ref.dtype)

        # append in place (aliased outputs): wait the window read started
        # at c == 0, select the new token into its sublane, write back the
        # aligned window.  Other cells' DMAs touch disjoint [b] slabs and
        # this cell's own chunk reads completed before finalize — no hazard
        pltpu.make_async_copy(
            ko_ref.at[b, :, pl.ds(aligned, 8), :], tok_k, sem.at[0]
        ).wait()
        pltpu.make_async_copy(
            vo_ref.at[b, :, pl.ds(aligned, 8), :], tok_v, sem.at[1]
        ).wait()
        hit = jax.lax.broadcasted_iota(jnp.int32, (KVH, 8, tok_k.shape[-1]),
                                       1) == (length - aligned)
        tok_k[...] = jnp.where(hit, nk_ref[0, 0][:, None, :], tok_k[...])
        tok_v[...] = jnp.where(hit, nv_ref[0, 0][:, None, :], tok_v[...])
        kc = pltpu.make_async_copy(
            tok_k, ko_ref.at[b, :, pl.ds(aligned, 8), :], sem.at[2]
        )
        vc = pltpu.make_async_copy(
            tok_v, vo_ref.at[b, :, pl.ds(aligned, 8), :], sem.at[3]
        )
        kc.start()
        vc.start()
        kc.wait()
        vc.wait()


def _pick_chunk(T: int) -> int:
    # largest 128-multiple divisor ≤ 1024: fewer grid steps amortize the
    # per-step fixed cost (T=768 at chunk 256 ran 96 steps/layer at
    # 274 GB/s; chunk 768 runs 32)
    for tc in range(1024, 127, -128):
        if T % tc == 0:
            return tc
    return 0


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "sliding_window")
)
def fused_decode_attention(
    q: jax.Array,            # [B, H, hd] bf16
    new_k: jax.Array,        # [B, KVH, hd]
    new_v: jax.Array,        # [B, KVH, hd]
    k_cache: jax.Array,      # [B, KVH, T, hd] (updated in place)
    v_cache: jax.Array,
    lengths: jax.Array,      # [B] int32 — tokens already cached; the new
                             # token is written at position lengths[b]
    *,
    sm_scale: float = 1.0,
    sliding_window: int | None = None,
):
    """Returns (out [B, H, hd], k_cache, v_cache) — caches updated in place.

    PRECONDITION: ``lengths[b] < T`` for every row — the new token is
    written at position ``lengths[b]``.  Callers guard this (decode loops
    stop at cap-1); the kernel clamps the append window so a violating
    call overwrites the row's own last window rather than reading out of
    bounds.

    Falls back to a jnp path when shapes are pallas-hostile (T not a
    multiple of 128, head_dim not lane-aligned).
    """
    B, H, hd = q.shape
    KVH, T = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH
    chunk = _pick_chunk(T)
    if chunk == 0 or hd % 64 != 0 or G > 32:
        return _decode_attention_jnp(
            q, new_k, new_v, k_cache, v_cache, lengths,
            sm_scale=sm_scale, sliding_window=sliding_window)

    nc = T // chunk
    sw = max(LANES, hd)      # stats width: lane-replicated, ≥ hd so the
    # acc update can slice (never broadcast) the alpha vreg
    qg = q.reshape(B, KVH, G, hd)
    nk = new_k.reshape(B, 1, KVH, hd).astype(k_cache.dtype)
    nv = new_v.reshape(B, 1, KVH, hd).astype(v_cache.dtype)

    def chunk_map(b, c, lens):
        # clamp: chunks past the row's valid region all map to the last
        # valid chunk — the pipeline elides the repeated fetches, so HBM
        # traffic tracks `length`, not capacity
        return (b, 0, jnp.minimum(c, lens[b] // chunk), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, KVH, G, hd), lambda b, c, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, KVH, hd), lambda b, c, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, KVH, hd), lambda b, c, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, KVH, chunk, hd), chunk_map),
            pl.BlockSpec((1, KVH, chunk, hd), chunk_map),
        ],
        out_specs=[
            pl.BlockSpec((1, KVH, G, hd), lambda b, c, lens: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((KVH, G, sw), jnp.float32),
            pltpu.VMEM((KVH, G, sw), jnp.float32),
            pltpu.VMEM((KVH, G, hd), jnp.float32),
            pltpu.VMEM((KVH, 8, hd), k_cache.dtype),
            pltpu.VMEM((KVH, 8, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, k_cache, v_cache = pl.pallas_call(
        functools.partial(
            _kernel, chunk=chunk, sm_scale=sm_scale,
            sliding_window=sliding_window,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # operand order: lengths(0), qg(1), nk(2), nv(3), k_cache(4),
        # v_cache(5) → outputs (o, ko, vo): alias caches in place
        input_output_aliases={4: 1, 5: 2},
        interpret=_use_interpret(),
    )(lengths, qg, nk, nv, k_cache, v_cache)
    return out.reshape(B, H, hd), k_cache, v_cache


def _decode_attention_jnp(q, new_k, new_v, k_cache, v_cache, lengths, *,
                          sm_scale, sliding_window):
    """jnp oracle / fallback: append via per-row dynamic update, grouped
    masked attention over the [B, KVH, T, hd] cache."""
    B, H, hd = q.shape
    KVH, T = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH
    k_cache = jax.vmap(
        lambda buf, kk, p: jax.lax.dynamic_update_slice(
            buf, kk[:, None, :].astype(buf.dtype), (0, p, 0))
    )(k_cache, new_k, lengths)
    v_cache = jax.vmap(
        lambda buf, vv, p: jax.lax.dynamic_update_slice(
            buf, vv[:, None, :].astype(buf.dtype), (0, p, 0))
    )(v_cache, new_v, lengths)
    qg = q.reshape(B, KVH, G, hd).astype(jnp.bfloat16)
    s = jnp.einsum(
        "bkgd,bktd->bkgt", qg, k_cache.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    pos = jnp.arange(T)[None, None, None, :]
    valid = pos <= lengths[:, None, None, None]
    if sliding_window is not None:
        valid &= pos > (lengths[:, None, None, None] - sliding_window)
    s = jnp.where(valid, s, MASK)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bkgt,bktd->bkgd", p.astype(jnp.bfloat16),
        v_cache.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    return o.reshape(B, H, hd).astype(q.dtype), k_cache, v_cache
