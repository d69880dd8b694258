"""Ring attention — context-parallel attention with overlapped KV rotation.

Sequence parallelism beyond the reference (SURVEY.md §2.C: the reference has
no SP/CP; BASELINE's north star asks for a design that scales).  KV shards
rotate around the `ring` mesh axis via ``jax.lax.ppermute`` while each device
accumulates online-softmax partial results for its Q shard; after N-1
rotations every query has attended every key.  Communication is
point-to-point over ICI and overlaps with compute under XLA's scheduler.

Run under ``shard_map`` with q/k/v sequence-sharded over the ring axis:

    f = shard_map(
        functools.partial(ring_attention, axis_name="sp", sm_scale=...),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def _block_attend(q, k, v, q_pos, k_pos, causal, sm_scale, m, l, o):
    """One online-softmax update of (m, l, o) with a KV block.

    q [B,H,Sq,D]; k/v [B,H,Sk,D]; positions are global token indices.
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    if causal:
        mask = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
        s = jnp.where(mask, s, NEG)
    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l = alpha * l + p.sum(axis=-1, keepdims=True)
    o = alpha * o + jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return m_new, l, o


def ring_attention(
    q: jax.Array,   # [B, H, Sq_shard, D] — this device's query shard
    k: jax.Array,   # [B, H, Sk_shard, D] — this device's KV shard
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: float = 1.0,
    causal: bool = True,
) -> jax.Array:
    """Context-parallel attention; call inside shard_map over `axis_name`."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    q_pos = my * Sq + jnp.arange(Sq)

    m = jnp.full((B, H, Sq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Sq, 1), jnp.float32)
    o = jnp.zeros((B, H, Sq, D), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, i):
        k_blk, v_blk, m, l, o = carry
        src = (my - i) % n                       # origin shard of current block
        k_pos = src * Sk + jnp.arange(Sk)
        m, l, o = _block_attend(q, k_blk, v_blk, q_pos, k_pos, causal, sm_scale,
                                m, l, o)
        # rotate for the next step (last rotation is harmless)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m, l, o), None

    (k, v, m, l, o), _ = jax.lax.scan(
        step, (k, v, m, l, o), jnp.arange(n)
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe).astype(q.dtype)
