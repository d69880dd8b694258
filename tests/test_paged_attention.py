"""Paged attention kernel vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_reference,
)


def _setup(B=3, H=4, KVH=2, D=128, page=16, pages_per_seq=4, n_pages=32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    k_pages = jax.random.normal(ks[1], (KVH, n_pages, page, D), jnp.bfloat16)
    v_pages = jax.random.normal(ks[2], (KVH, n_pages, page, D), jnp.bfloat16)
    # each sequence gets distinct scattered pages
    perm = jax.random.permutation(ks[3], n_pages)[: B * pages_per_seq]
    page_indices = perm.reshape(B, pages_per_seq).astype(jnp.int32)
    lengths = jnp.asarray([page * pages_per_seq, 37, 1], jnp.int32)[:B]
    return q, k_pages, v_pages, lengths, page_indices


def test_matches_reference():
    q, kp, vp, lengths, pidx = _setup()
    sm = 1.0 / np.sqrt(q.shape[-1])
    got = paged_attention(q, kp, vp, lengths, pidx, sm_scale=sm)
    want = paged_attention_reference(q, kp, vp, lengths, pidx, sm_scale=sm)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_mha_group_of_one():
    q, kp, vp, lengths, pidx = _setup(H=2, KVH=2)
    got = paged_attention(q, kp, vp, lengths, pidx, sm_scale=0.2)
    want = paged_attention_reference(q, kp, vp, lengths, pidx, sm_scale=0.2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_length_masking_ignores_garbage_pages():
    q, kp, vp, lengths, pidx = _setup(B=2)
    # sequence 1 has length 37 → positions ≥ 37 masked; poison those pages
    kp2 = kp.at[:, pidx[1, 3]].set(1e4)
    vp2 = vp.at[:, pidx[1, 3]].set(1e4)
    lengths = jnp.asarray([64, 37], jnp.int32)
    a = paged_attention(q, kp, vp, lengths, pidx, sm_scale=0.1)
    b = paged_attention(q, kp2, vp2, lengths, pidx, sm_scale=0.1)
    np.testing.assert_allclose(
        np.asarray(a, np.float32)[1], np.asarray(b, np.float32)[1], atol=2e-2
    )


def test_paged_attention_sliding_window_matches_oracle():
    """Kernel window mask ≡ jnp oracle window mask (exact, f32 KV)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qlora_tpu.ops.paged_attention import (
        paged_attention, paged_attention_reference)

    B, H, KVH, D, page, pps, n_pages = 3, 4, 2, 64, 8, 4, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (B, H, D), jnp.float32).astype(jnp.bfloat16)
    kp = jax.random.normal(k2, (KVH, n_pages, page, D), jnp.float32).astype(jnp.bfloat16)
    vp = jax.random.normal(k3, (KVH, n_pages, page, D), jnp.float32).astype(jnp.bfloat16)
    lengths = jnp.asarray([5, 17, 30], jnp.int32)
    tables = jax.random.permutation(k4, n_pages)[: B * pps].reshape(B, pps)

    for window in (4, 8, 12, None):
        out = paged_attention(q, kp, vp, lengths, tables, sm_scale=0.125,
                              sliding_window=window)
        ref = paged_attention_reference(q, kp, vp, lengths, tables,
                                        sm_scale=0.125, sliding_window=window)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
    # window must actually change the result once length > window
    full = paged_attention(q, kp, vp, lengths, tables, sm_scale=0.125)
    win = paged_attention(q, kp, vp, lengths, tables, sm_scale=0.125,
                          sliding_window=4)
    assert np.abs(np.asarray(full, np.float32)[1:]
                  - np.asarray(win, np.float32)[1:]).max() > 1e-3
