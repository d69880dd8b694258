"""Fused contiguous-cache decode attention (ops/decode_attention.py).

Parity vs a jnp oracle across GQA/MQA/MHA shapes, window masking, edge
lengths, and the pallas-hostile fallback; plus the in-place cache-append
semantics the serving engine depends on.  Runs the kernel in interpret
mode on CPU (the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qlora_tpu.ops.decode_attention import (
    _decode_attention_jnp,
    fused_decode_attention,
)


def _mk(B, H, KVH, hd, T, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.bfloat16)
    nk = jnp.asarray(rng.normal(size=(B, KVH, hd)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B, KVH, hd)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, KVH, T, hd)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, KVH, T, hd)), jnp.bfloat16)
    return q, nk, nv, kc, vc


@pytest.mark.parametrize(
    "B,H,KVH,hd,T",
    [
        (4, 8, 2, 128, 256),   # GQA
        (2, 4, 4, 128, 128),   # MHA
        (3, 8, 1, 64, 384),    # MQA, hd=64, T%256!=0 (chunk=128)
    ],
)
def test_kernel_matches_oracle(B, H, KVH, hd, T):
    q, nk, nv, kc, vc = _mk(B, H, KVH, hd, T)
    lens = jnp.asarray(
        np.random.default_rng(1).integers(0, T - 1, size=(B,)), jnp.int32
    )
    o, k2, v2 = fused_decode_attention(
        q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5)
    oo, k3, v3 = _decode_attention_jnp(
        q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5, sliding_window=None)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(oo, np.float32), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k3))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))


def test_edge_lengths_and_window():
    """length 0 (only the new token), length T-1 (last slot), sliding
    window — all match the oracle."""
    B, H, KVH, hd, T = 3, 4, 2, 128, 256
    q, nk, nv, kc, vc = _mk(B, H, KVH, hd, T, seed=2)
    lens = jnp.asarray([0, T - 1, 100], jnp.int32)
    for win in (None, 64):
        o, k2, v2 = fused_decode_attention(
            q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5, sliding_window=win)
        oo, _, _ = _decode_attention_jnp(
            q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5, sliding_window=win)
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(oo, np.float32), atol=2e-2)
    # the row with length 0 attends ONLY the new token: output == new_v
    np.testing.assert_allclose(
        np.asarray(o[0].reshape(KVH, H // KVH, hd), np.float32),
        np.broadcast_to(np.asarray(nv[0], np.float32)[:, None, :],
                        (KVH, H // KVH, hd)),
        atol=2e-2,
    )


def test_append_lands_at_length_position():
    B, H, KVH, hd, T = 2, 4, 2, 128, 128
    q, nk, nv, kc, vc = _mk(B, H, KVH, hd, T, seed=3)
    lens = jnp.asarray([7, 100], jnp.int32)
    _, k2, v2 = fused_decode_attention(
        q, nk, nv, kc, vc, lens, sm_scale=1.0)
    for b, ln in enumerate([7, 100]):
        np.testing.assert_array_equal(
            np.asarray(k2[b, :, ln]), np.asarray(nk[b]))
        np.testing.assert_array_equal(
            np.asarray(v2[b, :, ln]), np.asarray(nv[b]))
        # everything else untouched
        mask = np.ones(T, bool)
        mask[ln] = False
        np.testing.assert_array_equal(
            np.asarray(k2[b][:, mask]), np.asarray(kc[b][:, mask]))


def test_hostile_shape_falls_back():
    """T not 128-aligned → jnp fallback, still correct."""
    B, H, KVH, hd, T = 2, 4, 2, 64, 96
    q, nk, nv, kc, vc = _mk(B, H, KVH, hd, T, seed=4)
    lens = jnp.asarray([5, 40], jnp.int32)
    o, k2, _ = fused_decode_attention(
        q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5)
    oo, k3, _ = _decode_attention_jnp(
        q, nk, nv, kc, vc, lens, sm_scale=hd ** -0.5, sliding_window=None)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(oo, np.float32), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k3))


def test_decode_loop_consistency_with_prefill():
    """N sequential fused decode steps == one prefill attention over the
    same tokens: the e2e invariant the generation engine relies on."""
    from qlora_tpu.models.layers import attention_kvmajor

    B, H, KVH, hd, T = 2, 4, 2, 128, 128
    S0, NS = 10, 6
    rng = np.random.default_rng(5)
    keys = jnp.asarray(rng.normal(size=(B, KVH, T, hd)), jnp.bfloat16)
    vals = jnp.asarray(rng.normal(size=(B, KVH, T, hd)), jnp.bfloat16)
    qs = jnp.asarray(rng.normal(size=(NS, B, H, hd)), jnp.bfloat16)

    kc = jnp.zeros((B, KVH, T, hd), jnp.bfloat16).at[:, :, :S0].set(
        keys[:, :, :S0])
    vc = jnp.zeros((B, KVH, T, hd), jnp.bfloat16).at[:, :, :S0].set(
        vals[:, :, :S0])
    outs = []
    for t in range(NS):
        lens = jnp.full((B,), S0 + t, jnp.int32)
        o, kc, vc = fused_decode_attention(
            qs[t], keys[:, :, S0 + t], vals[:, :, S0 + t], kc, vc, lens,
            sm_scale=hd ** -0.5)
        outs.append(o)

    # reference: full attention at each step over the true prefix
    for t in range(NS):
        Tt = S0 + t + 1
        mask = jnp.ones((B, 1, 1, Tt), bool)
        ref = jax.jit(attention_kvmajor)(
            qs[t][:, None], keys[:, :, :Tt], vals[:, :, :Tt], mask)[:, 0]
        np.testing.assert_allclose(
            np.asarray(outs[t], np.float32), np.asarray(ref, np.float32),
            atol=3e-2,
        )
