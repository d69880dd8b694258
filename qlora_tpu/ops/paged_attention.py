"""Paged attention — decode-time attention over non-contiguous KV pages.

Serving engines share one physical page pool across many sequences; each
sequence maps logical positions to scattered pages via a page table
(`page_indices`).  This kernel gathers the pages for each (batch, kv-head)
cell with async DMA (all page copies in flight concurrently), computes
online-softmax attention for the query token, and masks beyond the true
sequence length — the TPU kernel playbook's paged-attention pattern.

Shapes:
  q            [B, H, D]                   (one decode token per sequence)
  k_pages      [KVH, n_pages, page, D]
  v_pages      [KVH, n_pages, page, D]
  lengths      [B]  int32
  page_indices [B, pages_per_seq] int32

GQA: H queries share KVH heads (H % KVH == 0); queries are grouped per
kv-head so each grid cell computes `H/KVH` rows against one KV stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(np.finfo(np.float32).max)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(
    # scalar-prefetch
    lengths_ref, page_idx_ref,
    # inputs
    q_ref, k_pages_ref, v_pages_ref,
    # outputs
    o_ref,
    # scratch
    k_buf, v_buf, sems,
    *, page: int, pages_per_seq: int, sm_scale: float,
    sliding_window: int | None,
):
    """Grid (B, KVH). Gathers this sequence's pages, then flash-style attention.

    k_pages/v_pages stay in ANY/HBM memory space; pages are DMA'd into VMEM
    scratch (all copies started back-to-back, waited once).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)

    # start all page DMAs concurrently (latency = slowest page, not the sum)
    for i in range(pages_per_seq):
        pidx = page_idx_ref[b, i]
        pltpu.make_async_copy(
            k_pages_ref.at[h, pidx], k_buf.at[i], sems.at[0]
        ).start()
        pltpu.make_async_copy(
            v_pages_ref.at[h, pidx], v_buf.at[i], sems.at[1]
        ).start()
    for i in range(pages_per_seq):
        pltpu.make_async_copy(
            k_pages_ref.at[h, 0], k_buf.at[0], sems.at[0]
        ).wait()
        pltpu.make_async_copy(
            v_pages_ref.at[h, 0], v_buf.at[0], sems.at[1]
        ).wait()

    T = page * pages_per_seq
    k = k_buf[:].reshape(T, k_buf.shape[-1]).astype(jnp.float32)
    v = v_buf[:].reshape(T, v_buf.shape[-1]).astype(jnp.float32)
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale          # [G, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                        # [G, T]
    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = pos < lengths_ref[b, 0]
    if sliding_window is not None:
        # q sits at position lengths-1; HF sliding-window semantics keep
        # keys with qpos - kpos < window  ⇔  kpos ≥ lengths - window
        # (matches the contiguous-cache path, models/transformer.py)
        valid &= pos >= lengths_ref[b, 0] - sliding_window
    s = jnp.where(valid, s, MASK)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / jnp.where(
        l == 0.0, 1.0, l
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "sliding_window"))
def paged_attention(
    q: jax.Array,              # [B, H, D]
    k_pages: jax.Array,        # [KVH, n_pages, page, D]
    v_pages: jax.Array,
    lengths: jax.Array,        # [B]
    page_indices: jax.Array,   # [B, pages_per_seq]
    *,
    sm_scale: float = 1.0,
    sliding_window: int | None = None,
) -> jax.Array:
    B, H, D = q.shape
    KVH, n_pages, page, _ = k_pages.shape
    pages_per_seq = page_indices.shape[1]
    G = H // KVH               # query heads per kv head

    qg = q.reshape(B, KVH, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # k_pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # v_pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((pages_per_seq, page, D), k_pages.dtype),
            pltpu.VMEM((pages_per_seq, page, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, page=page, pages_per_seq=pages_per_seq, sm_scale=sm_scale,
            sliding_window=sliding_window,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), q.dtype),
        interpret=_use_interpret(),
    )(lengths.reshape(B, 1), page_indices, qg, k_pages, v_pages)
    return out.reshape(B, H, D)


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              sm_scale=1.0, sliding_window=None):
    """jnp oracle: gather pages, masked softmax attention."""
    B, H, D = q.shape
    KVH, n_pages, page, _ = k_pages.shape
    pps = page_indices.shape[1]
    T = page * pps
    G = H // KVH
    # gather [B, KVH, T, D]
    k = k_pages[:, page_indices]                     # [KVH, B, pps, page, D]
    v = v_pages[:, page_indices]
    k = jnp.moveaxis(k, 1, 0).reshape(B, KVH, T, D)
    v = jnp.moveaxis(v, 1, 0).reshape(B, KVH, T, D)
    qg = q.reshape(B, KVH, G, D).astype(jnp.float32) * sm_scale
    s = jnp.einsum("bkgd,bktd->bkgt", qg, k.astype(jnp.float32))
    mask = jnp.arange(T)[None, None, None, :] < lengths[:, None, None, None]
    if sliding_window is not None:
        mask &= (jnp.arange(T)[None, None, None, :]
                 >= lengths[:, None, None, None] - sliding_window)
    s = jnp.where(mask, s, MASK)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgt,bktd->bkgd", p, v.astype(jnp.float32))
    return o.reshape(B, H, D).astype(q.dtype)
