"""Flash attention vs jnp oracle: forward, backward, masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.ops.flash_attention import attention_reference, flash_attention


def _mk(key, B, H, Sq, Skv, D):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (B, H, Sq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, Skv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, Skv, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    B, H, S, D = 2, 2, 256, 128
    q, k, v = _mk(0, B, H, S, S, D)
    lengths = jnp.asarray([S, S - 70], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    got = flash_attention(q, k, v, lengths, sm, causal)
    want = attention_reference(q, k, v, lengths, sm, causal)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
    )


def test_multi_tile_online_softmax():
    # Skv spans multiple 128-tiles => exercises the running-max correction
    B, H, Sq, Skv, D = 1, 1, 128, 512, 128
    q, k, v = _mk(1, B, H, Sq, Skv, D)
    k = k * 3.0  # widen score range to stress the max updates
    lengths = jnp.asarray([Skv], jnp.int32)
    got = flash_attention(q, k, v, lengths, 0.2, False, block_q=128, block_k=128)
    want = attention_reference(q, k, v, lengths, 0.2, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3, rtol=3e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_grads_match_reference(causal):
    B, H, S, D = 1, 2, 128, 128
    q, k, v = _mk(2, B, H, S, S, D)
    lengths = jnp.asarray([S], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, sm, causal) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, lengths, sm, causal) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2,
            err_msg=f"d{name} mismatch",
        )


def test_padding_gradients_are_zero():
    B, H, S, D = 1, 1, 128, 128
    q, k, v = _mk(3, B, H, S, S, D)
    L = 50
    lengths = jnp.asarray([L], jnp.int32)

    def f(k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, 1.0, True))

    dk, dv = jax.grad(f, argnums=(0, 1))(k, v)
    # keys past the valid length must receive no gradient
    assert np.abs(np.asarray(dk)[:, :, L:]).max() == 0
    assert np.abs(np.asarray(dv)[:, :, L:]).max() == 0


def test_gqa_grouped_kv_forward_and_grads():
    # kernel-side GQA: KV has fewer heads; compare vs repeated-KV reference
    B, H, KVH, S, D = 1, 4, 2, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, KVH, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, KVH, S, D), jnp.float32)
    lengths = jnp.asarray([S], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    kr = jnp.repeat(k, H // KVH, axis=1)
    vr = jnp.repeat(v, H // KVH, axis=1)
    got = flash_attention(q, k, v, lengths, sm, True)
    want = attention_reference(q, kr, vr, lengths, sm, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, sm, True) ** 2)

    def loss_ref(q, kf, vf):
        return jnp.sum(attention_reference(q, kf, vf, lengths, sm, True) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rkf, rvf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kr, vr)
    rk = rkf.reshape(B, KVH, H // KVH, S, D).sum(2)
    rv = rvf.reshape(B, KVH, H // KVH, S, D).sum(2)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("window", [4, 64, 200])
def test_sliding_window_matches_reference(window):
    B, H, S, D = 1, 2, 256, 128
    q, k, v = _mk(6, B, H, S, S, D)
    lengths = jnp.asarray([S], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    got = flash_attention(q, k, v, lengths, sm, True, 128, 128, window)
    want = attention_reference(q, k, v, lengths, sm, True, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_sliding_window_grads():
    B, H, S, D = 1, 1, 128, 128
    q, k, v = _mk(7, B, H, S, S, D)
    lengths = jnp.asarray([S], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, sm, True, 128, 128, 32) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, lengths, sm, True, 32) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_fully_masked_rows_emit_sentinel_and_zero_output():
    """kv_lengths == 0 rows: documented +3e38 lse sentinel, zero output,
    zero grads (round-2 advisor: the l==0 sentinel was dead code under
    additive masking; emptiness is now detected via the mask-floor max)."""
    from qlora_tpu.ops.flash_attention import flash_attention_lse

    B, H, S, D = 2, 1, 128, 128
    q, k, v = _mk(11, B, H, S, S, D)
    lengths = jnp.asarray([S, 0], jnp.int32)   # batch 1 fully masked
    sm = 1.0 / np.sqrt(D)

    out, lse = flash_attention_lse(q, k, v, lengths, sm, False)
    assert np.all(np.asarray(lse)[1] > 1e37), "empty rows must hold +BIG lse"
    assert np.abs(np.asarray(out)[1]).max() == 0, "empty rows must output 0"
    # non-empty batch element unaffected
    want = attention_reference(q[:1], k[:1], v[:1], lengths[:1], sm, False)
    np.testing.assert_allclose(np.asarray(out)[:1], np.asarray(want),
                               atol=2e-3, rtol=2e-3)

    def f(q, k, v):
        o, _ = flash_attention_lse(q, k, v, lengths, sm, False)
        return jnp.sum(o ** 2)

    gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        arr = np.asarray(g)[1]
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(arr).max() == 0, "empty batch element must get 0 grads"
