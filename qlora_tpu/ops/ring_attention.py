"""Ring attention — context-parallel attention with overlapped KV rotation.

Sequence parallelism beyond the reference (SURVEY.md §2.C: the reference has
no SP/CP; BASELINE's north star asks for a design that scales).  KV shards
rotate around the `ring` mesh axis via ``jax.lax.ppermute`` while each device
accumulates online-softmax partial results for its Q shard; after N-1
rotations every query has attended every key.  Communication is
point-to-point over ICI and overlaps with compute under XLA's scheduler.

Each rotation's chunk attention runs through the Pallas FLASH kernel
(``flash_attention_lse``): bf16 MXU dots and no [Sq, Sk] f32 score matrix in
HBM — the jnp online-softmax path remains as the fallback for lane-hostile
head dims.  Per-chunk (out, lse) partials merge with the standard
log-sum-exp combine; gradients stay exact because the lse cotangent folds
into the flash backward kernels (see flash_attention._fal_bwd).

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


def _ring_jnp(q, k, v, axis_name, sm_scale, causal, n, my):
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


def _merge(lse_run, o_run, lse_i, o_i):
    """LSE-combine two NORMALIZED partials; -inf lse marks an empty partial."""
    m = jnp.maximum(lse_run, lse_i)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    a = jnp.where(jnp.isneginf(lse_run), 0.0, jnp.exp(lse_run - m_safe))
    b = jnp.where(jnp.isneginf(lse_i), 0.0, jnp.exp(lse_i - m_safe))
    denom = a + b
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o_new = (a[..., None] * o_run + b[..., None] * o_i) / safe[..., None]
    lse_new = jnp.where(denom == 0.0, -jnp.inf, m_safe + jnp.log(safe))
    return lse_new, o_new


def _ring_flash(q, k, v, axis_name, sm_scale, causal, n, my):
    from qlora_tpu.ops.flash_attention import flash_attention_lse

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    perm = [(i, (i + 1) % n) for i in range(n)]

    lse_run = jnp.full((B, H, Sq), -jnp.inf, jnp.float32)
    o_run = jnp.zeros((B, H, Sq, D), jnp.float32)
    k_blk, v_blk = k, v
    full = jnp.full((B,), Sk, jnp.int32)
    # interior (non-causal) chunks dominate the ring (n-1 of n rotations)
    # and keep every kv tile live — bk=2048 amortizes the VPU softmax over
    # a bigger MXU s-dot: 0.604 -> 0.708 MFU on the sp=4 local shape (r5
    # on-chip sweep).  The DIAGONAL chunk is causal and keeps 1024/1024:
    # bk=2048 makes tile-skip too coarse there (measured 2.64 -> 3.06 ms
    # at S=4096 causal — a pinned negative).
    bq, bk = 1024, 2048
    bq_c, bk_c = 1024, 1024

    for i in range(n):                       # n is the static ring size
        src = (my - i) % n
        if causal:
            # diagonal chunk: local causal mask; earlier chunks: full
            # attention; later chunks: kv_length 0 masks everything (the
            # kernel emits the +BIG sentinel → empty partial)
            lens = jnp.where(src < my, Sk, 0) * jnp.ones((B,), jnp.int32)
            o_i, lse_i = jax.lax.cond(
                src == my,
                lambda a: flash_attention_lse(a[0], a[1], a[2], a[3],
                                              sm_scale, True, bq_c, bk_c),
                lambda a: flash_attention_lse(a[0], a[1], a[2], a[4],
                                              sm_scale, False, bq, bk),
                (q, k_blk, v_blk, full, lens),
            )
        else:
            o_i, lse_i = flash_attention_lse(q, k_blk, v_blk, full,
                                             sm_scale, False, bq, bk)
        lse_i = jnp.where(lse_i > 1e37, -jnp.inf, lse_i)   # masked-row mark
        lse_run, o_run = _merge(lse_run, o_run, lse_i,
                                o_i.astype(jnp.float32))
        if i + 1 < n:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
    return o_run.astype(q.dtype)


def ring_attention(
    q: jax.Array,   # [B, H, Sq_shard, D] — this device's query shard
    k: jax.Array,   # [B, H, Sk_shard, D] — this device's KV shard
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: float = 1.0,
    causal: bool = True,
    impl: str = "auto",   # "auto" | "flash" | "jnp"
) -> jax.Array:
    """Context-parallel attention; call inside shard_map over `axis_name`."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    use_flash = impl == "flash" or (
        impl == "auto" and q.shape[-1] % 64 == 0 and q.shape[2] % 8 == 0
        and k.shape[2] % 8 == 0
    )
    if use_flash:
        return _ring_flash(q, k, v, axis_name, sm_scale, causal, n, my)
    return _ring_jnp(q, k, v, axis_name, sm_scale, causal, n, my)
