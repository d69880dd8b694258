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
    assert pool.n_free == 15      # page 0 reserved as scratch
    pool.allocate(1, 10)          # 3 pages
    pool.allocate(2, 4)           # 1 page
    assert pool.n_free == 11
    assert 0 not in pool.tables[1] + pool.tables[2]
    pool.extend(1, 13)            # 4th page
    assert len(pool.tables[1]) == 4
    pool.release(1)
    assert pool.n_free == 14
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
    """Batcher results are independent of slots/admission interleaving
    (cross-request isolation under shared pools), and the first generated
    token — produced by the shared contiguous prefill path — matches plain
    batch generate() exactly.

    Full-sequence token equality vs generate() is NOT asserted: generate()
    decodes through the fused CONTIGUOUS kernel and the batcher through the
    fused PAGED kernel, whose bf16 accumulation orders differ (chunked
    online softmax vs single pass) — near-tie argmaxes on this random
    debug model can legitimately flip.  Per-step logit parity between the
    two kernels is pinned in test_paged_decode (3e-2)."""
    from qlora_tpu.generate import generate
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)

    def ref_first(prompt):
        toks = generate(params, None, jnp.asarray([prompt], jnp.int32),
                        jnp.asarray([len(prompt)]), cfg,
                        max_new_tokens=1, eos_id=-1)
        return int(np.asarray(toks)[0][0])

    def run(num_slots, order):
        pb = PagedBatcher(params, None, cfg, num_slots=num_slots, n_pages=64,
                          page_size=8, max_pages_per_seq=8,
                          prefill_buckets=(16,), eos_id=-1)
        reqs = {}
        for name, prompt, n in order:
            reqs[name] = pb.submit(prompt, max_new_tokens=n)
        pb.run_to_completion()
        assert pb.pool.n_free == 63   # every page recycled (page 0 reserved)
        return {name: r.generated for name, r in reqs.items()}

    p1, p2, p3 = [3, 17, 5, 9], [4, 7], [11, 2, 6]
    jobs = [("a", p1, 5), ("b", p2, 5), ("c", p3, 4)]
    concurrent = run(2, jobs)              # c queues behind the two slots
    sequential = run(1, jobs)              # fully serial
    reordered = run(2, [jobs[2], jobs[0], jobs[1]])
    assert concurrent == sequential
    assert concurrent == reordered
    for name, prompt in (("a", p1), ("b", p2), ("c", p3)):
        assert concurrent[name][0] == ref_first(prompt)
        assert len(concurrent[name]) == dict((j[0], j[2]) for j in jobs)[name]


def test_paged_sliding_window_matches_contiguous():
    """A sliding-window (Mistral-style) model served through pages must mask
    exactly like the contiguous-cache path once context exceeds the window
    (round-1 gap: the paged branch masked by length only)."""
    from qlora_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, sliding_window=8,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    B, S = 2, 12    # prefill already exceeds the window during decode
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)

    cache = init_cache(cfg, B, 32)
    logits_p, cache = forward(params, None, ids, cfg, cache=cache)
    cache = dict(cache, length=jnp.full((B,), S, jnp.int32))

    pool = PagedPool(cfg, n_pages=32, page_size=8, max_pages_per_seq=4)
    uids = [11, 22]
    for i, uid in enumerate(uids):
        pool.allocate(uid, S)
        pool.write_prefill(uid, cache["k"][:, i, :S], cache["v"][:, i, :S])
    paged = pool.decode_cache(uids, [S, S])

    tok = jnp.argmax(logits_p[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for _ in range(6):
        lc, cache = forward(params, None, tok, cfg, cache=cache)
        for i, uid in enumerate(uids):
            pool.extend(uid, int(paged["length"][i]) + 1)
        paged = dict(paged, tables=pool.table_array(uids))
        lp, paged = forward(params, None, tok, cfg, cache=paged)
        pool.update_from(paged)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(lc[:, 0], -1)),
            np.asarray(jnp.argmax(lp[:, 0], -1)),
        )
        # logit closeness, not just argmax (atol covers the contiguous
        # path's bf16 prob cast; a wrong window mask diverges by O(1))
        np.testing.assert_allclose(np.asarray(lc[:, 0]), np.asarray(lp[:, 0]),
                                   atol=6e-2, rtol=6e-2)
        tok = jnp.argmax(lc[:, 0], -1)[:, None].astype(jnp.int32)


def test_paged_batcher_long_prompt_truncates_not_crashes():
    """Prompts longer than the largest prefill bucket truncate from the left
    (round-1 bug: numpy broadcast ValueError in _admit)."""
    from qlora_tpu.generate import generate
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.models import get_config

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    long_prompt = [(i * 7) % cfg.vocab_size for i in range(25)]  # > bucket 16
    pb = PagedBatcher(params, None, cfg, num_slots=2, n_pages=64, page_size=8,
                      max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1)
    r = pb.submit(long_prompt, max_new_tokens=4)
    pb.run_to_completion()

    kept = long_prompt[-12:]   # cap = min(64-4... , bucket 16) minus room: 12
    # reference on the actually-kept prompt
    cap = min(8 * 8 - 4, 16)
    kept = long_prompt[-cap:]
    toks = generate(params, None, jnp.asarray([kept], jnp.int32),
                    jnp.asarray([len(kept)]), cfg, max_new_tokens=4, eos_id=-1)
    assert r.generated == np.asarray(toks)[0].tolist()


def test_sliding_window_page_eviction_allows_long_generation():
    """Rolling eviction: a windowed model generates past the pool capacity
    because pages fully behind the window are freed.  Eviction only ever
    touches MASKED positions, so the evicting run must be BIT-identical to
    a non-evicting paged run with an ample pool."""
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, sliding_window=8,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    prompt = [5, 9, 3]
    n_new = 30
    # 7 usable pages x 4 = 28 pooled tokens < 3 + 30 total: only eviction
    # lets this complete
    pb = PagedBatcher(params, None, cfg, num_slots=1, n_pages=8, page_size=4,
                      max_pages_per_seq=16, prefill_buckets=(16,), eos_id=-1)
    r = pb.submit(prompt, max_new_tokens=n_new)
    pb.run_to_completion()
    assert len(r.generated) == n_new
    assert pb.pool.n_free == 7      # everything released (page 0 reserved)

    ref = PagedBatcher(params, None, cfg, num_slots=1, n_pages=32,
                       page_size=4, max_pages_per_seq=16,
                       prefill_buckets=(16,), eos_id=-1,
                       rolling_eviction=False)
    r2 = ref.submit(prompt, max_new_tokens=n_new)
    ref.run_to_completion()
    assert r.generated == r2.generated


def test_decode_bursts_match_single_step():
    """steps_per_dispatch > 1 (multi-step scheduling: N sampled decode
    steps per dispatch) produces the same tokens as the single-step
    batcher — same kernel, greedy sampling, same admission order."""
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)

    def run(spd):
        pb = PagedBatcher(params, None, cfg, num_slots=2, n_pages=64,
                          page_size=8, max_pages_per_seq=8,
                          prefill_buckets=(16,), eos_id=-1,
                          steps_per_dispatch=spd)
        rs = [pb.submit([3, 17, 5, 9], max_new_tokens=7),
              pb.submit([4, 7], max_new_tokens=5),
              pb.submit([11, 2, 6], max_new_tokens=6)]
        pb.run_to_completion()
        assert pb.pool.n_free == 63
        return [r.generated for r in rs]

    single = run(1)
    burst = run(4)
    assert single == burst, (single, burst)
    assert [len(g) for g in single] == [7, 5, 6]


def test_random_traffic_stress_pool_invariants():
    """Randomized serving traffic: staggered submits, natural EOS
    retirement, mixed prompt/output lengths, decode bursts.  Asserts the
    allocator returns to fully-free, every request terminates within its
    budget, and steps_per_dispatch does not change the schedule's
    outputs (greedy)."""
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    rng = np.random.default_rng(7)
    traffic = [(rng.integers(1, cfg.vocab_size, size=rng.integers(1, 20))
                .tolist(), int(rng.integers(1, 10))) for _ in range(10)]

    def run(spd):
        pb = PagedBatcher(params, None, cfg, num_slots=3, n_pages=32,
                          page_size=8, max_pages_per_seq=6,
                          prefill_buckets=(8, 16, 32), eos_id=5,
                          steps_per_dispatch=spd)
        reqs = []
        # staggered: two submits per engine step until the trace drains
        queue = list(traffic)
        while queue or pb.queue or pb.num_active:
            for _ in range(2):
                if queue:
                    prompt, n = queue.pop(0)
                    reqs.append(pb.submit(prompt, max_new_tokens=n))
            pb.step()
        assert pb.pool.n_free == 31          # page 0 reserved
        assert not pb.pool.tables
        for r, (_, n) in zip(reqs, traffic):
            assert r.done and len(r.generated) <= n
        return [r.generated for r in reqs]

    single = run(1)
    burst = run(4)
    assert single == burst, (single, burst)


def test_batched_admission_matches_single():
    """admit_batch>1 groups same-bucket prefills into one padded dispatch;
    greedy outputs must be identical to per-admission dispatch, and the
    allocator must still drain to fully-free."""
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    rng = np.random.default_rng(11)
    traffic = [(rng.integers(1, cfg.vocab_size, size=rng.integers(1, 24))
                .tolist(), int(rng.integers(2, 8))) for _ in range(9)]

    def run(ab, spd=1):
        pb = PagedBatcher(params, None, cfg, num_slots=4, n_pages=32,
                          page_size=8, max_pages_per_seq=6,
                          prefill_buckets=(16, 32), eos_id=5,
                          admit_batch=ab, steps_per_dispatch=spd)
        reqs = [pb.submit(p, max_new_tokens=n) for p, n in traffic]
        pb.run_to_completion()
        assert pb.pool.n_free == 31
        assert not pb.pool.tables
        return [r.generated for r in reqs]

    base = run(1)
    grouped = run(3)     # forces a padded final group and mixed buckets
    assert base == grouped, (base, grouped)
    # combined scheduling (the bench serving config): batched admission
    # together with multi-step decode bursts must not change greedy output
    combined = run(3, spd=4)
    assert base == combined, (base, combined)


# ---------------------------------------------------------------------------
# speculative serving (verify-chunk decode inside the batcher)
# ---------------------------------------------------------------------------


def _spec_run(params, cfg, *, spec, spd=1, traffic=None, eos=-1,
              max_pages_per_seq=8, decode_impl=None, sparams=None, seed=0,
              return_engine=False, **kw):
    from qlora_tpu.generate.paged import PagedBatcher

    pb = PagedBatcher(params, None, cfg, num_slots=3, n_pages=64,
                      page_size=8, max_pages_per_seq=max_pages_per_seq,
                      prefill_buckets=(16,), eos_id=eos,
                      steps_per_dispatch=spd, spec_draft_len=spec,
                      decode_impl=decode_impl, sparams=sparams, seed=seed,
                      **kw)
    reqs = []
    queue = list(traffic)
    while queue or pb.queue or pb.num_active:
        for _ in range(2):
            if queue:
                prompt, n = queue.pop(0)
                reqs.append(pb.submit(prompt, max_new_tokens=n))
        pb.step()
    assert pb.pool.n_free == 63
    assert not pb.pool.tables
    if return_engine:
        return [r.generated for r in reqs], pb
    return [r.generated for r in reqs]


def _spec_traffic(n=8, seed=3, vocab=64, nmax=12):
    rng = np.random.default_rng(seed)
    return [(rng.integers(1, vocab, size=rng.integers(2, 14)).tolist(),
             int(rng.integers(2, nmax))) for _ in range(n)]


def test_speculative_batcher_matches_plain_greedy():
    """Schedule parity: the speculative batcher emits exactly the plain
    greedy batcher's tokens — acceptance only ever keeps the model's own
    argmax, so draft quality changes chunk count, never output."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic()
    plain = _spec_run(params, cfg, spec=0, traffic=traffic)
    spec = _spec_run(params, cfg, spec=3, traffic=traffic)
    assert plain == spec, (plain, spec)


def test_speculative_burst_matches_single_chunk():
    """steps_per_dispatch chunks per dispatch == one chunk per dispatch."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=6, seed=5)
    one = _spec_run(params, cfg, spec=2, spd=1, traffic=traffic)
    burst = _spec_run(params, cfg, spec=2, spd=3, traffic=traffic)
    assert one == burst, (one, burst)


def test_speculative_eos_and_capacity_fallback():
    """EOS retirement mid-chunk + the near-capacity fallback to the plain
    per-token step (cap 4 pages x 8 = 32 tokens: long generations force
    room < N*C) both preserve greedy parity."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=5, seed=9, nmax=20)
    plain = _spec_run(params, cfg, spec=0, traffic=traffic, eos=5,
                      max_pages_per_seq=4)
    spec = _spec_run(params, cfg, spec=4, spd=2, traffic=traffic, eos=5,
                     max_pages_per_seq=4)
    assert plain == spec, (plain, spec)


def test_speculative_rejection_sampled_completes():
    """Sampled spec serving: rejection-sampled acceptance — every request
    terminates within budget, tokens come from the top-k support, and the
    pool drains clean.  (Distributional exactness of accept_and_resample
    is pinned in tests/test_speculative.py.)"""
    from qlora_tpu.generate.sampler import SamplingParams

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=5, seed=11)
    sp = SamplingParams(do_sample=True, temperature=0.9, top_k=8)
    outs = _spec_run(params, cfg, spec=3, spd=2, traffic=traffic,
                     sparams=sp, seed=123)
    for gen, (_, n) in zip(outs, traffic):
        assert 0 < len(gen) <= n


def test_adaptive_speculation_demotes_and_keeps_greedy_parity():
    """spec_adaptive: when the rolling tokens-per-chunk sits below
    spec_break_even the engine must demote to the plain decode path
    (holdoff), RE-PROBE after it expires, and still emit exactly the
    plain greedy stream — adaptivity changes scheduling, never output.
    break_even=100 forces demotion as soon as the window fills."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=8, seed=17, nmax=40)
    plain = _spec_run(params, cfg, spec=0, traffic=traffic)
    adapt, pb = _spec_run(params, cfg, spec=3, traffic=traffic,
                          spec_adaptive=True, spec_break_even=100.0,
                          return_engine=True)
    assert plain == adapt, (plain, adapt)
    # demotion happened: at least one full holdoff (plus the plain-first
    # probe dispatch) ran on the plain path
    assert pb.spec_plain_dispatches >= pb._spec_holdoff
    # re-probe happened: speculation resumed past the first window
    assert pb.spec_chunks > pb._spec_window_chunks


def test_adaptive_speculation_stays_on_when_paying():
    """break_even=0 never demotes: beyond the single plain-first probe
    dispatch (compile-warming), the adaptive engine keeps speculating,
    and greedy output matches the fixed speculative engine exactly."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=6, seed=19)
    fixed = _spec_run(params, cfg, spec=3, spd=2, traffic=traffic)
    adapt, pb = _spec_run(params, cfg, spec=3, spd=2, traffic=traffic,
                          spec_adaptive=True, spec_break_even=0.0,
                          return_engine=True)
    assert fixed == adapt, (fixed, adapt)
    assert pb.spec_plain_dispatches <= 1         # the probe only


def test_speculative_int8_impl_completes():
    """decode_impl='int8' composes with speculation (the serving config)."""
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    traffic = _spec_traffic(n=4, seed=13)
    outs = _spec_run(params, cfg, spec=2, spd=2, traffic=traffic,
                     decode_impl="int8")
    for gen, (_, n) in zip(outs, traffic):
        assert 0 < len(gen) <= n


# ---------------------------------------------------------------------------
# optimistic admission + preemption (vLLM-style continuous batching)
# ---------------------------------------------------------------------------


def test_optimistic_admission_preempts_and_matches_reserved():
    """Intentionally over-commit the pool: optimistic admission admits on
    the prompt footprint, decode grows pages on demand, exhaustion
    preempts the youngest sequence (release + requeue-for-recompute).
    The trace must complete with EXACTLY the reserved-admission greedy
    outputs, drain the pool clean, and actually exercise preemption."""
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    rng = np.random.default_rng(21)
    # 4 requests x worst case pages_needed(10+28)=5 pages vs a 16-page
    # pool: reserved admits ~3 at a time, optimistic all 4 (2 pages each)
    traffic = [(rng.integers(1, 64, size=10).tolist(), 28) for _ in range(4)]

    def run(admission):
        pb = PagedBatcher(params, None, cfg, num_slots=4, n_pages=17,
                          page_size=8, max_pages_per_seq=8,
                          prefill_buckets=(16,), eos_id=-1,
                          admission=admission)
        reqs = [pb.submit(p, max_new_tokens=n) for p, n in traffic]
        peak_active = 0
        while pb.queue or pb.num_active:
            pb.step()
            peak_active = max(peak_active, pb.num_active)
        assert pb.pool.n_free == 16
        assert not pb.pool.tables
        for r, (_, n) in zip(reqs, traffic):
            assert r.done and len(r.generated) == n
        return ([r.generated for r in reqs], peak_active, pb.preemptions,
                {reqs.index(next(r for r in reqs if r.uid == uid)): g
                 for uid, g in pb.preemption_log})

    res_out, res_peak, res_pre, _ = run("reserved")
    opt_out, opt_peak, opt_pre, plog = run("optimistic")
    assert res_pre == 0, "true reservation must never preempt"
    assert opt_pre > 0, "over-committed trace must exercise preemption"
    assert opt_peak > res_peak, (opt_peak, res_peak)
    # greedy parity: non-preempted requests match token-for-token; a
    # preempted request matches through its eviction point, after which
    # the re-prefilled continuation may diverge only on bf16 near-ties
    # (prefill-chunk vs decode-step accumulation order -- the same caveat
    # tests/test_speculative.py pins)
    for i, (o, r) in enumerate(zip(opt_out, res_out)):
        if i in plog:
            g = plog[i]
            assert o[:g] == r[:g], (i, g, o[:g], r[:g])
            assert len(o) == len(r)
        else:
            assert o == r, (i, o, r)


def test_optimistic_speculative_preemption():
    """Preemption composes with the speculative verify-chunk path."""
    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    rng = np.random.default_rng(22)
    traffic = [(rng.integers(1, 64, size=10).tolist(), 24) for _ in range(4)]

    def run(admission, spec):
        pb = PagedBatcher(params, None, cfg, num_slots=4, n_pages=17,
                          page_size=8, max_pages_per_seq=8,
                          prefill_buckets=(16,), eos_id=-1,
                          admission=admission, spec_draft_len=spec)
        reqs = [pb.submit(p, max_new_tokens=n) for p, n in traffic]
        pb.run_to_completion()
        assert pb.pool.n_free == 16 and not pb.pool.tables
        return ([r.generated for r in reqs], pb.preemptions,
                {reqs.index(next(r for r in reqs if r.uid == uid)): g
                 for uid, g in pb.preemption_log})

    # reference is ALSO speculative (chunk-verify numerics differ from the
    # per-token step on bf16 near-ties — the caveat the big-pool parity
    # tests above pin), so preemption is the only variable here
    ref, ref_pre, _ = run("reserved", 3)
    out, pre, plog = run("optimistic", 3)
    assert ref_pre == 0 and pre > 0
    for i, (o, r) in enumerate(zip(out, ref)):
        g = plog.get(i, len(r))
        assert o[:g] == r[:g], (i, g)
        assert len(o) == len(r)


def test_optimistic_single_sequence_pool_too_small_raises():
    """A pool smaller than one sequence's need must raise (clear message),
    not livelock on self-preemption + re-admission."""
    import pytest

    from qlora_tpu.generate.paged import PagedBatcher

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    pb = PagedBatcher(params, None, cfg, num_slots=1, n_pages=4,
                      page_size=8, max_pages_per_seq=8,
                      prefill_buckets=(16,), eos_id=-1,
                      admission="optimistic")
    pb.submit(list(range(1, 15)), max_new_tokens=40)
    with pytest.raises(MemoryError, match="too small for a single"):
        pb.run_to_completion()
