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


def test_paged_batcher_matches_batch_generate():
    from qlora_tpu.generate import generate
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)

    def ref(prompt, n):
        toks = generate(params, None, jnp.asarray([prompt], jnp.int32),
                        jnp.asarray([len(prompt)]), cfg,
                        max_new_tokens=n, eos_id=-1)
        return np.asarray(toks)[0].tolist()

    pb = PagedBatcher(params, None, cfg, num_slots=2, n_pages=64, page_size=8,
                      max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1)
    p1, p2, p3 = [3, 17, 5, 9], [4, 7], [11, 2, 6]
    r1 = pb.submit(p1, max_new_tokens=5)
    r2 = pb.submit(p2, max_new_tokens=5)
    r3 = pb.submit(p3, max_new_tokens=4)   # queued behind the two slots
    pb.run_to_completion()
    assert r1.generated == ref(p1, 5)
    assert r2.generated == ref(p2, 5)
    assert r3.generated == ref(p3, 4)
    # all pages returned to the free list
    assert pb.pool.n_free == 64
