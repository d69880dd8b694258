"""Fused paged decode attention vs jnp oracle (interpret mode on CPU).

Pool layout is page-major [np, KVH, page, D]; the kernel appends the new
token into its page in place AND attends it from VMEM, so every test
drives the full (append + attend) semantics against `_paged_decode_jnp`.
"""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.ops.paged_attention import (
    _paged_decode_jnp,
    fused_paged_decode_attention,
    paged_attention_reference,
)


def _setup(B=3, H=4, KVH=2, D=128, page=16, pages_per_seq=4, n_pages=32,
           key=0, lengths=None):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    q = jax.random.normal(ks[0], (B, H, D)).astype(jnp.bfloat16)
    nk = jax.random.normal(ks[4], (B, KVH, D)).astype(jnp.bfloat16)
    nv = jax.random.normal(ks[5], (B, KVH, D)).astype(jnp.bfloat16)
    k_pages = jax.random.normal(ks[1], (n_pages, KVH, page, D)).astype(
        jnp.bfloat16)
    v_pages = jax.random.normal(ks[2], (n_pages, KVH, page, D)).astype(
        jnp.bfloat16)
    # each sequence gets distinct scattered pages
    perm = jax.random.permutation(ks[3], n_pages - 1)[: B * pages_per_seq] + 1
    page_indices = perm.reshape(B, pages_per_seq).astype(jnp.int32)
    if lengths is None:
        lengths = [page * pages_per_seq - 1, 37, 0]
    lengths = jnp.asarray(lengths, jnp.int32)[:B]
    return q, nk, nv, k_pages, v_pages, lengths, page_indices


def _check(args, sm, window=None):
    q, nk, nv, kp, vp, lengths, pidx = args
    got, kg, vg = fused_paged_decode_attention(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=sm, sliding_window=window)
    want, kw, vw = _paged_decode_jnp(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=sm, sliding_window=window)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)
    np.testing.assert_array_equal(np.asarray(kg), np.asarray(kw))
    np.testing.assert_array_equal(np.asarray(vg), np.asarray(vw))
    return got, kg, vg


def test_matches_reference():
    args = _setup()
    _check(args, 1.0 / np.sqrt(args[0].shape[-1]))


def test_mha_group_of_one():
    _check(_setup(H=2, KVH=2), 0.2)


def test_gqa_many_groups():
    _check(_setup(H=8, KVH=2, key=3), 0.11)


def test_append_lands_in_page():
    q, nk, nv, kp, vp, lengths, pidx = _setup(lengths=[37, 16, 0])
    page = kp.shape[2]
    _, kg, vg = fused_paged_decode_attention(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=0.1)
    for b, ln in enumerate([37, 16, 0]):
        wp = int(pidx[b, ln // page])
        off = ln % page
        np.testing.assert_array_equal(np.asarray(kg[wp, :, off]),
                                      np.asarray(nk[b]))
        np.testing.assert_array_equal(np.asarray(vg[wp, :, off]),
                                      np.asarray(nv[b]))


def test_length_masking_ignores_garbage_pages():
    q, nk, nv, kp, vp, _, pidx = _setup(B=2)
    # sequence 1 has length 37 → pages ≥ 3 invalid; poison them
    kp2 = kp.at[pidx[1, 3]].set(1e4)
    vp2 = vp.at[pidx[1, 3]].set(jnp.nan)
    lengths = jnp.asarray([64, 37], jnp.int32)
    a, _, _ = fused_paged_decode_attention(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=0.1)
    b, _, _ = fused_paged_decode_attention(
        q, nk, nv, kp2, vp2, lengths, pidx, sm_scale=0.1)
    np.testing.assert_allclose(
        np.asarray(a, np.float32)[1], np.asarray(b, np.float32)[1], atol=2e-2)
    assert np.isfinite(np.asarray(b, np.float32)).all()


def test_sliding_window_matches_oracle():
    args = _setup(B=3, H=4, KVH=2, D=64, page=8, pages_per_seq=4, n_pages=16,
                  lengths=[5, 17, 30])
    for window in (4, 8, 12, None):
        _check(args, 0.125, window)
    full, _, _ = fused_paged_decode_attention(
        *args[:5], args[5], args[6], sm_scale=0.125)
    win, _, _ = fused_paged_decode_attention(
        *args[:5], args[5], args[6], sm_scale=0.125, sliding_window=4)
    assert np.abs(np.asarray(full, np.float32)[1:]
                  - np.asarray(win, np.float32)[1:]).max() > 1e-3


def test_reference_layout():
    """paged_attention_reference (attention only, no append) masks by
    length on the page-major pool layout."""
    q, _, _, kp, vp, lengths, pidx = _setup()
    out = paged_attention_reference(q, kp, vp, lengths, pidx, sm_scale=0.1)
    # row with length 0 attends nothing valid → uniform over MASKed rows;
    # just check shape/dtype and finiteness
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_decode_loop_consistency():
    """Sequential fused paged steps reproduce attention over the full
    prefix (the invariant PagedBatcher depends on)."""
    B, H, KVH, D, page, pps, n_pages = 2, 4, 2, 128, 16, 4, 16
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.normal(size=(B, KVH, pps * page, D)), jnp.bfloat16)
    vals = jnp.asarray(rng.normal(size=(B, KVH, pps * page, D)), jnp.bfloat16)
    kp = jnp.zeros((n_pages, KVH, page, D), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    pidx = jnp.asarray([[1, 3, 5, 7], [2, 4, 6, 8]], jnp.int32)
    S0, NS = 10, 5
    # seed the pools with the first S0 tokens via the jnp scatter
    for t in range(S0):
        lens = jnp.full((B,), t, jnp.int32)
        _, kp, vp = _paged_decode_jnp(
            jnp.zeros((B, H, D), jnp.bfloat16), keys[:, :, t], vals[:, :, t],
            kp, vp, lens, pidx, sm_scale=1.0, sliding_window=None)
    qs = jnp.asarray(rng.normal(size=(NS, B, H, D)), jnp.bfloat16)
    for t in range(NS):
        lens = jnp.full((B,), S0 + t, jnp.int32)
        o, kp, vp = fused_paged_decode_attention(
            qs[t], keys[:, :, S0 + t], vals[:, :, S0 + t], kp, vp, lens,
            pidx, sm_scale=D ** -0.5)
        # reference over the true contiguous prefix
        Tt = S0 + t + 1
        qg = qs[t].reshape(B, KVH, H // KVH, D).astype(jnp.float32)
        s = jnp.einsum("bkgd,bktd->bkgt", qg * D ** -0.5,
                       keys[:, :, :Tt].astype(jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("bkgt,bktd->bkgd", p,
                         vals[:, :, :Tt].astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(o, np.float32),
            np.asarray(ref.reshape(B, H, D), np.float32), atol=3e-2)


# ---------------------------------------------------------------------------
# chunk-verify kernel (speculative decoding over the paged pool)
# ---------------------------------------------------------------------------


def _setup_chunk(B=3, C=4, H=4, KVH=2, D=128, page=16, pages_per_seq=4,
                 n_pages=32, key=0, lengths=None):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    q = jax.random.normal(ks[0], (B, C, H, D)).astype(jnp.bfloat16)
    nk = jax.random.normal(ks[4], (B, C, KVH, D)).astype(jnp.bfloat16)
    nv = jax.random.normal(ks[5], (B, C, KVH, D)).astype(jnp.bfloat16)
    k_pages = jax.random.normal(ks[1], (n_pages, KVH, page, D)).astype(
        jnp.bfloat16)
    v_pages = jax.random.normal(ks[2], (n_pages, KVH, page, D)).astype(
        jnp.bfloat16)
    perm = jax.random.permutation(ks[3], n_pages - 1)[: B * pages_per_seq] + 1
    page_indices = perm.reshape(B, pages_per_seq).astype(jnp.int32)
    if lengths is None:
        # capacity boundary (length + C == T), mid-page straddle, empty
        lengths = [page * pages_per_seq - C, 15, 0]
    lengths = jnp.asarray(lengths, jnp.int32)[:B]
    return q, nk, nv, k_pages, v_pages, lengths, page_indices


def _check_chunk(args, sm, window=None):
    from qlora_tpu.ops.paged_attention import (
        _paged_chunk_jnp, fused_paged_chunk_attention,
    )

    q, nk, nv, kp, vp, lengths, pidx = args
    got, kg, vg = fused_paged_chunk_attention(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=sm, sliding_window=window)
    want, kw, vw = _paged_chunk_jnp(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=sm, sliding_window=window)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)
    np.testing.assert_array_equal(np.asarray(kg), np.asarray(kw))
    np.testing.assert_array_equal(np.asarray(vg), np.asarray(vw))


def test_chunk_matches_oracle():
    args = _setup_chunk()
    _check_chunk(args, 1.0 / np.sqrt(args[0].shape[-1]))


def test_chunk_page_straddle():
    # C=8 tokens starting 3 before a page boundary: append spans two pages
    args = _setup_chunk(C=8, lengths=[13, 29, 47])
    _check_chunk(args, 0.125)


def test_chunk_sliding_window():
    args = _setup_chunk(C=4, lengths=[40, 22, 9])
    _check_chunk(args, 0.2, window=24)


def test_chunk_c1_matches_decode_kernel():
    # C=1 chunk == the single-token decode kernel up to accumulation order
    from qlora_tpu.ops.paged_attention import fused_paged_chunk_attention

    q, nk, nv, kp, vp, lengths, pidx = _setup(lengths=[30, 17, 5])
    got_c, kc_, vc_ = fused_paged_chunk_attention(
        q[:, None], nk[:, None], nv[:, None], kp, vp, lengths, pidx,
        sm_scale=0.2)
    got_d, kd, vd = fused_paged_decode_attention(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=0.2)
    np.testing.assert_allclose(
        np.asarray(got_c[:, 0], np.float32), np.asarray(got_d, np.float32),
        atol=3e-2, rtol=3e-2)
    np.testing.assert_array_equal(np.asarray(kc_), np.asarray(kd))
    np.testing.assert_array_equal(np.asarray(vc_), np.asarray(vd))


def test_chunk_in_chunk_causality():
    """A draft token must not see later drafts: compare row c of a C-chunk
    against a (c+1)-prefix chunk — identical outputs row by row."""
    from qlora_tpu.ops.paged_attention import _paged_chunk_jnp

    q, nk, nv, kp, vp, lengths, pidx = _setup_chunk(B=1, C=4, lengths=[21])
    full, _, _ = _paged_chunk_jnp(
        q, nk, nv, kp, vp, lengths, pidx, sm_scale=0.2, sliding_window=None)
    for c in range(4):
        pre, _, _ = _paged_chunk_jnp(
            q[:, : c + 1], nk[:, : c + 1], nv[:, : c + 1], kp, vp,
            lengths, pidx, sm_scale=0.2, sliding_window=None)
        np.testing.assert_allclose(
            np.asarray(full[:, c], np.float32),
            np.asarray(pre[:, c], np.float32), atol=1e-5, rtol=1e-5)
