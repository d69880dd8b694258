"""Paged decode path through forward(): must match contiguous-cache decode."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.models import forward, get_config, init_cache, init_params


def _paged_from_contiguous(cache, cfg, page=16, n_pages=64, seed=0):
    """Scatter a contiguous cache into page pools with a random page map."""
    L, B, KVH, T, hd = cache["k"].shape
    mp = T // page
    rng = np.random.default_rng(seed)
    flat = rng.permutation(n_pages)[: B * mp]
    tables = jnp.asarray(flat.reshape(B, mp), jnp.int32)
    kp = jnp.zeros((L, n_pages, KVH, page, hd), jnp.bfloat16)
    vp = jnp.zeros((L, n_pages, KVH, page, hd), jnp.bfloat16)
    k = np.asarray(cache["k"])  # [L, B, KVH, T, hd]
    v = np.asarray(cache["v"])
    kp_n, vp_n = np.array(kp), np.array(vp)  # writable copies
    for b in range(B):
        for j in range(mp):
            pg = int(tables[b, j])
            kp_n[:, pg] = k[:, b, :, j * page : (j + 1) * page]
            vp_n[:, pg] = v[:, b, :, j * page : (j + 1) * page]
    return {
        "k_pages": jnp.asarray(kp_n), "v_pages": jnp.asarray(vp_n),
        "tables": tables, "length": cache["length"],
    }


def test_paged_decode_matches_contiguous():
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    B, S, T = 2, 6, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)

    cache = init_cache(cfg, B, T)
    logits_p, cache = forward(params, None, ids, cfg, cache=cache)
    cache = dict(cache, length=jnp.full((B,), S, jnp.int32))
    paged = _paged_from_contiguous(cache, cfg)

    tok = jnp.argmax(logits_p[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for step in range(4):
        lc, cache = forward(params, None, tok, cfg, cache=cache)
        lp, paged = forward(params, None, tok, cfg, cache=paged)
        np.testing.assert_allclose(
            np.asarray(lc[:, 0]), np.asarray(lp[:, 0]), atol=3e-2, rtol=3e-2,
        )
        nxt_c = np.asarray(jnp.argmax(lc[:, 0], -1))
        nxt_p = np.asarray(jnp.argmax(lp[:, 0], -1))
        np.testing.assert_array_equal(nxt_c, nxt_p)
        tok = jnp.asarray(nxt_c)[:, None].astype(jnp.int32)
