"""Generation tests: greedy decode vs full-forward argmax, sampling ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.generate import (
    SamplingParams, generate, generate_stream, top_k_mask, top_p_mask,
)
from qlora_tpu.generate.sampler import apply_repetition_penalty
from qlora_tpu.models import forward, get_config, init_params


@pytest.fixture(scope="module", params=["debug", "debug-neox"])
def model(request):
    cfg = get_config(request.param)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    return cfg, params


def _greedy_reference(params, cfg, prompt, n_new):
    """Slow oracle: full forward each step, argmax last position."""
    ids = list(prompt)
    for _ in range(n_new):
        logits, _ = forward(params, None, jnp.asarray([ids], jnp.int32), cfg)
        ids.append(int(jnp.argmax(logits[0, -1])))
    return ids[len(prompt):]


def test_greedy_matches_full_forward(model):
    """Cached decode ≡ full forward, teacher-forced.

    The decode path runs the fused Pallas cache kernel while the oracle
    reruns the whole no-cache forward (flash/jnp attention); their bf16
    accumulation orders differ, so exact token equality over a free-running
    rollout is not a sound invariant (a near-tie argmax can flip and then
    the paths diverge by construction).  Instead both paths consume the
    SAME oracle token stream and must agree on logits within kernel
    tolerance — and on the argmax wherever the decision margin exceeds
    that tolerance."""
    from qlora_tpu.generate.engine import prefill
    from qlora_tpu.models.transformer import init_cache

    cfg, params = model
    prompt = [3, 17, 5, 9]
    n_new = 6
    want = _greedy_reference(params, cfg, prompt, n_new)

    ids = jnp.asarray([prompt], jnp.int32)
    cache = init_cache(cfg, 1, len(prompt) + n_new)
    logits, cache = prefill(params, None, ids, jnp.asarray([len(prompt)]),
                            cfg, cache=cache)
    stream = list(prompt)
    for t in range(n_new):
        # oracle logits for the next position given the SAME tokens
        full, _ = forward(params, None, jnp.asarray([stream], jnp.int32), cfg)
        ref = np.asarray(full[0, -1], np.float32)
        got = np.asarray(logits[0], np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-2)
        top2 = np.sort(ref)[-2:]
        if top2[1] - top2[0] > 1e-1:   # decision margin >> kernel tolerance
            assert int(got.argmax()) == int(ref.argmax()) == want[t]
        stream.append(want[t])          # teacher-force the oracle's token
        logits, cache = forward(
            params, None, jnp.asarray([[want[t]]], jnp.int32), cfg,
            cache=cache)
        logits = logits[:, 0]


def test_generate_batch_with_padding(model):
    cfg, params = model
    # two prompts of different lengths, right-padded
    ids = jnp.asarray([[3, 17, 5, 9], [4, 7, 0, 0]], jnp.int32)
    lengths = jnp.asarray([4, 2])
    toks = generate(params, None, ids, lengths, cfg, max_new_tokens=4, eos_id=-1)
    assert toks.shape == (2, 4)
    # row 1 must match generating it alone (padding must not leak)
    solo = generate(
        params, None, jnp.asarray([[4, 7]], jnp.int32), jnp.asarray([2]), cfg,
        max_new_tokens=4, eos_id=-1,
    )
    np.testing.assert_array_equal(np.asarray(toks)[1], np.asarray(solo)[0])


def test_stream_matches_batch(model):
    cfg, params = model
    ids = jnp.asarray([[3, 17, 5]], jnp.int32)
    lengths = jnp.asarray([3])
    batch_toks = np.asarray(
        generate(params, None, ids, lengths, cfg, max_new_tokens=5, eos_id=-1)
    )[0]
    stream_toks = [
        t[0] for t in generate_stream(
            params, None, ids, lengths, cfg, max_new_tokens=5, eos_id=-1
        )
    ]
    np.testing.assert_array_equal(batch_toks, np.asarray(stream_toks))


def test_eos_stops_and_pads(model):
    cfg, params = model
    ids = jnp.asarray([[3, 5]], jnp.int32)
    # eos = whatever greedy emits first => expect all-eos output after stop
    first = _greedy_reference(params, cfg, [3, 5], 1)[0]
    toks = generate(
        params, None, ids, jnp.asarray([2]), cfg, max_new_tokens=4, eos_id=first
    )
    assert (np.asarray(toks) == first).all()


def test_top_k_mask():
    logits = jnp.asarray([[1.0, 3.0, 2.0, -1.0]])
    out = np.asarray(top_k_mask(logits, 2))
    assert np.isfinite(out[0, [1, 2]]).all()
    assert np.isinf(out[0, [0, 3]]).all()


def test_top_p_mask_keeps_top1():
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(top_p_mask(logits, 0.5))
    assert np.isfinite(out[0, 0])
    assert np.isinf(out[0, 1:]).all()


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seen = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(logits, seen, 2.0))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0])


def test_sampling_reproducible(model):
    cfg, params = model
    ids = jnp.asarray([[3, 17, 5]], jnp.int32)
    sp = SamplingParams(do_sample=True, temperature=0.8, top_k=50, top_p=0.9)
    a = generate(params, None, ids, jnp.asarray([3]), cfg, max_new_tokens=4,
                 eos_id=-1, sparams=sp, rng=jax.random.PRNGKey(7))
    b = generate(params, None, ids, jnp.asarray([3]), cfg, max_new_tokens=4,
                 eos_id=-1, sparams=sp, rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_min_new_tokens_suppresses_eos(model):
    cfg, params = model
    ids = jnp.asarray([[3, 5]], jnp.int32)
    first = _greedy_reference(params, cfg, [3, 5], 1)[0]
    # force eos = first greedy token; min_new_tokens must delay the stop
    toks = generate(
        params, None, ids, jnp.asarray([2]), cfg, max_new_tokens=5,
        eos_id=first, min_new_tokens=3,
    )
    row = np.asarray(toks)[0]
    assert (row[:3] != first).sum() >= 2  # eos suppressed early on


def test_beam_search_beats_or_matches_greedy_logprob(model):
    cfg, params = model
    prompt = [3, 17, 5]
    ids = jnp.asarray([prompt], jnp.int32)
    L = jnp.asarray([3])
    greedy = generate(params, None, ids, L, cfg, max_new_tokens=4, eos_id=-1)
    beam = generate(params, None, ids, L, cfg, max_new_tokens=4, eos_id=-1,
                    num_beams=3)
    assert beam.shape == greedy.shape

    def seq_logprob(seq):
        toks = list(prompt)
        total = 0.0
        for t in np.asarray(seq)[0]:
            logits, _ = forward(params, None, jnp.asarray([toks], jnp.int32), cfg)
            lp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
            total += float(lp[int(t)])
            toks.append(int(t))
        return total

    assert seq_logprob(beam) >= seq_logprob(greedy) - 1e-3


def test_typical_p_mask_keeps_probability_mass():
    from qlora_tpu.generate.sampler import typical_p_mask
    logits = jnp.asarray([[3.0, 2.0, 1.0, -3.0, -5.0]])
    out = np.asarray(typical_p_mask(logits, 0.8))
    assert np.isfinite(out).sum() >= 1
    assert np.isinf(out).any()  # something filtered


def test_no_repeat_ngram_bans_completion():
    from qlora_tpu.generate.sampler import ban_repeated_ngrams
    # history: [5, 7, 5] and suffix ... 5 → bigram (5,7) seen → ban 7
    hist = jnp.asarray([[5, 7, 5, 0, 0]])
    logits = jnp.zeros((1, 10))
    out = np.asarray(ban_repeated_ngrams(logits, hist, jnp.int32(3), 2))
    assert np.isinf(out[0, 7]) and out[0, 7] < 0
    assert np.isfinite(out[0, 5])


def test_no_repeat_ngram_in_generation(model):
    cfg, params = model
    ids = jnp.asarray([[3, 17]], jnp.int32)
    sp = SamplingParams(no_repeat_ngram_size=2)
    toks = generate(params, None, ids, jnp.asarray([2]), cfg,
                    max_new_tokens=12, eos_id=-1, sparams=sp)
    row = np.asarray(toks)[0].tolist()
    bigrams = list(zip(row, row[1:]))
    assert len(bigrams) == len(set(bigrams)), row  # no repeated bigram


def test_generate_int8_decode_impl(model):
    """decode_impl='int8' (offline per-column serving copy + direct int8
    MXU decode) must run end-to-end and stay close to the exact path:
    identical output shape/eos semantics, and logit-level agreement is
    already pinned by test_serve_int8 — here we bound token drift on a
    short greedy rollout (small weights → int8 error ≪ decision margins
    for the first steps)."""
    cfg, params = model
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    lengths = jnp.asarray([5], jnp.int32)
    exact = np.asarray(generate(params, None, prompt, lengths, cfg,
                                max_new_tokens=8, eos_id=-1))
    i8 = np.asarray(generate(params, None, prompt, lengths, cfg,
                             max_new_tokens=8, eos_id=-1,
                             decode_impl="int8"))
    assert i8.shape == exact.shape
    # first greedy steps must agree (drift later is legitimate: a near-tie
    # argmax under ~1% logit error can flip and diverge by construction)
    assert (i8[0, :2] == exact[0, :2]).all(), (i8, exact)

    # streaming path: same serving tree reused via decode_params
    from qlora_tpu.generate.serve_int8 import (
        requantize_params_int8_unstacked,
    )

    dec = requantize_params_int8_unstacked(params)
    toks = [t for t in generate_stream(params, None, prompt, lengths, cfg,
                                       max_new_tokens=4, eos_id=-1,
                                       decode_impl="int8",
                                       decode_params=dec)]
    assert len(toks) == 4
    assert [int(t[0]) for t in toks[:2]] == list(exact[0, :2])
