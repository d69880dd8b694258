"""Prompt-lookup speculative decoding: exact greedy equivalence.

The invariant is strong: speculation may only change HOW MANY forward
passes the rollout takes, never the tokens — verification accepts a draft
only when it equals the model's own argmax, so the output must be
bit-identical to plain greedy generate() on any input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qlora_tpu.generate import generate
from qlora_tpu.generate.speculative import generate_speculative
from qlora_tpu.models import get_config, init_params


@pytest.fixture(scope="module", params=["debug", "debug-neox"])
def model(request):
    cfg = get_config(request.param)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    return cfg, params


def _assert_greedy_equiv(base, spec, params, cfg, ids, lengths, eos_id):
    """Rows must match exactly — except that a divergence whose decision
    margin is a near-tie is legitimate: the T=1 fused decode kernel (plain
    generate) and the chunked verify pass (speculation) have different
    bf16 accumulation orders, so an argmax decided by <0.05 logits can
    flip between the two numeric paths (same caveat as
    test_greedy_matches_full_forward).  At the first divergence we
    recompute the full-forward logits and require a near-tie."""
    from qlora_tpu.models import forward as _fwd

    for b in range(base.shape[0]):
        if (base[b] == spec[b]).all():
            continue
        d = int(np.argmax(base[b] != spec[b]))
        L = int(lengths[b])
        ctx = list(np.asarray(ids[b, :L])) + [int(t) for t in base[b, :d]]
        logits = _fwd(params, None, jnp.asarray([ctx], jnp.int32), cfg)[0]
        lg = np.asarray(logits[0, -1], np.float32)
        top2 = np.sort(lg)[-2:]
        margin = float(top2[1] - top2[0])
        assert margin < 0.05, (
            f"row {b} diverged at step {d} with a decisive margin "
            f"{margin}: base {base[b]}, spec {spec[b]}")


def _both(params, cfg, ids, lengths, n_new, **spec_kw):
    base = np.asarray(generate(params, None, ids, lengths, cfg,
                               max_new_tokens=n_new, eos_id=5,
                               max_len=ids.shape[1] + n_new
                               + spec_kw.get("draft_len", 8) + 1))
    spec = np.asarray(generate_speculative(params, None, ids, lengths, cfg,
                                           max_new_tokens=n_new, eos_id=5,
                                           **spec_kw))
    return base, spec


def test_spec_matches_greedy_repetitive(model):
    """Repetitive prompt: high draft acceptance, identical output."""
    cfg, params = model
    pat = [7, 3, 9, 4]
    prompt = (pat * 6)[:20]
    ids = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([len(prompt)], jnp.int32)
    base, spec = _both(params, cfg, ids, lengths, 16, draft_len=4)
    _assert_greedy_equiv(base, spec, params, cfg, ids, lengths, 5)


def test_spec_matches_greedy_random(model):
    """Adversarially random prompt: ~zero acceptance, still identical."""
    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, cfg.vocab_size, size=17).tolist()
    ids = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([len(prompt)], jnp.int32)
    base, spec = _both(params, cfg, ids, lengths, 12, draft_len=6, ngram=3)
    _assert_greedy_equiv(base, spec, params, cfg, ids, lengths, 5)


def test_spec_batch_with_padding(model):
    """Rows of different lengths retire at different rates; eos-padded
    outputs must still match plain greedy row-for-row."""
    cfg, params = model
    rng = np.random.default_rng(11)
    p1 = rng.integers(1, cfg.vocab_size, size=9).tolist()
    p2 = ([2, 8, 2, 8] * 4)[:14]
    S = max(len(p1), len(p2))
    ids = np.zeros((2, S), np.int32)
    ids[0, :len(p1)] = p1
    ids[1, :len(p2)] = p2
    ids = jnp.asarray(ids)
    lengths = jnp.asarray([len(p1), len(p2)], jnp.int32)
    base, spec = _both(params, cfg, ids, lengths, 10, draft_len=3)
    _assert_greedy_equiv(base, spec, params, cfg, ids, lengths, 5)


def test_spec_int8_runs(model):
    """decode_impl='int8' composes; first tokens match the int8 generate."""
    cfg, params = model
    prompt = ([4, 9, 4, 9] * 5)[:16]
    ids = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([16], jnp.int32)
    i8 = np.asarray(generate(params, None, ids, lengths, cfg,
                             max_new_tokens=8, eos_id=-1,
                             decode_impl="int8"))
    spec = np.asarray(generate_speculative(params, None, ids, lengths, cfg,
                                           max_new_tokens=8, eos_id=-1,
                                           draft_len=4, decode_impl="int8"))
    assert spec.shape == i8.shape
    assert (spec[0, :2] == i8[0, :2]).all(), (spec, i8)


def test_accept_and_resample_is_exact():
    """Distributional exactness of speculative rejection sampling: for ANY
    fixed drafts, the emitted first token's distribution equals the target
    p — accept d w.p. p(d), else sample the renormalized residual, which
    telescopes back to exactly p (Leviathan et al.).  Verified empirically
    on a tiny vocab with 40k vectorized draws."""
    from qlora_tpu.generate.speculative import accept_and_resample

    V, k, n = 8, 1, 40000
    p = np.asarray([0.30, 0.02, 0.18, 0.05, 0.20, 0.10, 0.05, 0.10],
                   np.float32)
    probs = jnp.broadcast_to(jnp.asarray(p), (n, k + 1, V))
    for d in (0, 1, 4):     # high-, low-, mid-probability drafts
        drafts = jnp.full((n, k), d, jnp.int32)
        keys = jax.random.PRNGKey(d)
        toks, n_acc = jax.jit(accept_and_resample)(keys, probs, drafts)
        toks = np.asarray(toks)
        n_acc = np.asarray(n_acc)
        first = toks[:, 0]      # emitted first token (draft or resample)
        emp = np.bincount(first, minlength=V) / n
        tv = 0.5 * np.abs(emp - p).sum()
        assert tv < 0.02, (d, tv, emp)
        # acceptance rate of the draft must be ~p(d)
        acc_rate = float((n_acc == 2).mean())
        assert abs(acc_rate - p[d]) < 0.02, (d, acc_rate)


def test_spec_sampled_reproducible_and_low_temp_matches_greedy(model):
    """Same rng → same sampled output; temperature→0 collapses to the
    greedy speculative rollout."""
    from qlora_tpu.generate import SamplingParams

    cfg, params = model
    prompt = ([6, 2, 9] * 6)[:15]
    ids = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([15], jnp.int32)
    sp = SamplingParams(do_sample=True, temperature=0.8, top_p=0.95)
    a = np.asarray(generate_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=5,
        draft_len=4, sparams=sp, rng=jax.random.PRNGKey(7)))
    b = np.asarray(generate_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=5,
        draft_len=4, sparams=sp, rng=jax.random.PRNGKey(7)))
    assert (a == b).all()

    cold = SamplingParams(do_sample=True, temperature=1e-4)
    c = np.asarray(generate_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=5,
        draft_len=4, sparams=cold, rng=jax.random.PRNGKey(0)))
    g = np.asarray(generate_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=5,
        draft_len=4))
    assert (c == g).all(), (c, g)


def test_spec_sampled_rejects_history_penalties(model):
    from qlora_tpu.generate import SamplingParams

    cfg, params = model
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    with pytest.raises(NotImplementedError):
        generate_speculative(
            params, None, ids, jnp.asarray([3], jnp.int32), cfg,
            sparams=SamplingParams(do_sample=True, repetition_penalty=1.3))


def test_stream_spec_matches_batch_spec(model):
    """The streaming host-loop and the in-graph while_loop use the same
    chunked verify kernel, so greedy outputs must match token-for-token
    (drafts may differ; acceptance makes output draft-independent)."""
    from qlora_tpu.generate.speculative import generate_stream_speculative

    cfg, params = model
    prompt = ([5, 12, 7, 12] * 5)[:18]
    ids = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([18], jnp.int32)
    batch = np.asarray(generate_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=3,
        draft_len=4))
    streamed = [int(t[0]) for t in generate_stream_speculative(
        params, None, ids, lengths, cfg, max_new_tokens=12, eos_id=3,
        draft_len=4)]
    # streamed stops at eos; batch output is eos-padded
    want = list(batch[0])
    assert streamed == want[:len(streamed)], (streamed, want)
    if len(streamed) < 12:
        assert streamed[-1] == 3 or len(streamed) == 12
        assert all(t == 3 for t in want[len(streamed):])
