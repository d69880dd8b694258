"""PagedPool allocator + end-to-end paged decode via the pool."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.generate.paged import PagedPool
from qlora_tpu.models import forward, get_config, init_cache, init_params


def test_allocator_lifecycle():
    cfg = get_config("debug")
    pool = PagedPool(cfg, n_pages=16, page_size=4, max_pages_per_seq=8)
    pool.allocate(1, 10)          # 3 pages
    pool.allocate(2, 4)           # 1 page
    assert pool.n_free == 12
    pool.extend(1, 13)            # 4th page
    assert len(pool.tables[1]) == 4
    pool.release(1)
    assert pool.n_free == 15
    with pytest.raises(MemoryError):
        pool.allocate(3, 16 * 4 + 1)


def test_pool_prefill_and_decode_matches_contiguous():
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    B, S = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)

    # contiguous prefill
    cache = init_cache(cfg, B, 32)
    logits_p, cache = forward(params, None, ids, cfg, cache=cache)
    cache = dict(cache, length=jnp.full((B,), S, jnp.int32))

    # scatter each sequence's KV into the pool
    pool = PagedPool(cfg, n_pages=32, page_size=8, max_pages_per_seq=4)
    uids = [101, 202]
    for i, uid in enumerate(uids):
        k_i = cache["k"][:, i, :S]    # [L, S, KVH, hd]
        v_i = cache["v"][:, i, :S]
        pool.allocate(uid, S)
        pool.write_prefill(uid, k_i, v_i)
    paged = pool.decode_cache(uids, [S, S])

    tok = jnp.argmax(logits_p[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for _ in range(3):
        lc, cache = forward(params, None, tok, cfg, cache=cache)
        # grow tables if the next token crosses a page boundary
        for i, uid in enumerate(uids):
            pool.extend(uid, int(paged["length"][i]) + 1)
        paged = dict(paged, tables=pool.table_array(uids))
        lp, paged = forward(params, None, tok, cfg, cache=paged)
        pool.update_from(paged)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(lc[:, 0], -1)),
            np.asarray(jnp.argmax(lp[:, 0], -1)),
        )
        tok = jnp.argmax(lc[:, 0], -1)[:, None].astype(jnp.int32)
