"""Prompt-lookup speculative decoding (greedy-exact).

Single-stream decode is weight-streaming-bound: every generated token
re-reads all weights for ONE token of work.  Speculation verifies k
drafted tokens in one forward pass, so each weight pass can retire up to
k+1 tokens — and greedy verification makes the output EXACTLY the greedy
rollout (a draft is kept only if it equals the model's own argmax).

Drafts come from the prompt itself (prompt-lookup / n-gram speculation:
the latest earlier occurrence of the last `ngram` tokens proposes the
`draft_len` tokens that followed it) — no draft model, no extra weights.
Acceptance is content-dependent: summarization/extraction/chat-with-
context traces re-use long spans and accept most drafts; adversarially
random token streams accept ~none and pay one wasted verify chunk per
token (bounded downside: the chunk still yields its 1 guaranteed token).

The whole rollout runs in ONE jit'd while_loop (draft matching is
in-graph), composing with decode_impl="int8" the same way decode_loop
does.  The reference has no counterpart (its generate is HF token-at-a-
time); this is the TPU-native answer to the serving-latency gap called
out in /root/reference/README.md:135.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward, init_cache
from qlora_tpu.generate.sampler import (
    SamplingParams, top_k_mask, top_p_mask, typical_p_mask,
)


def _target_probs(logits, sparams):
    """Temperature/top-k/top-p/typical-p-adjusted target distribution —
    the same per-step distribution sample_token draws from."""
    if sparams.temperature != 1.0:
        logits = logits / jnp.maximum(sparams.temperature, 1e-6)
    logits = top_k_mask(logits, sparams.top_k)
    logits = top_p_mask(logits, sparams.top_p)
    logits = typical_p_mask(logits, sparams.typical_p)
    return jax.nn.softmax(logits, axis=-1)


def accept_and_resample(rng, probs, drafts):
    """Speculative rejection sampling with a DETERMINISTIC (point-mass)
    draft distribution — the Leviathan et al. scheme specialized to
    prompt-lookup drafts.

    probs [B, k+1, V]: target distribution at each chunk position;
    drafts [B, k].  Draft i is accepted with probability probs[b, i, d_i]
    (q is a point mass, so min(1, p/q) = p(d)); at the FIRST rejection
    the replacement token is drawn from the residual — p with the
    rejected draft's mass removed, renormalized — and if every draft is
    accepted the bonus token samples probs[:, k].  This makes the OUTPUT
    SEQUENCE distribution exactly ancestral sampling from p, whatever
    the drafts are (unit-tested distributionally in
    tests/test_speculative.py).

    Returns (tokens [B, k+1], n_acc [B]): tokens[b, :n_acc[b]] are the
    emitted tokens (n_acc = accepted drafts + 1)."""
    B, k1, V = probs.shape
    k = k1 - 1
    ru, rs = jax.random.split(rng)
    u = jax.random.uniform(ru, (B, k))
    p_d = jnp.take_along_axis(probs[:, :k], drafts[..., None], -1)[..., 0]
    acc = jnp.cumprod(u < p_d, axis=1)                       # [B, k]
    j = jnp.sum(acc, axis=1)                                 # accepted count
    rows = jnp.arange(B)
    pos = jnp.minimum(j, k)
    p_fin = probs[rows, pos]                                 # [B, V]
    rejected = j < k
    d_rej = drafts[rows, jnp.minimum(j, k - 1)]
    p_fin = jnp.where(
        rejected[:, None],
        p_fin * (1.0 - jax.nn.one_hot(d_rej, V, dtype=p_fin.dtype)),
        p_fin,
    )
    # zero-mass tokens (top-k/top-p-masked, or the rejected draft whose
    # mass was just zeroed) must stay unsampleable: -inf logits, not a
    # floor.  If the residual underflows to all-zeros (leaked f32 mass)
    # fall back to the residual-free target's argmax rather than a
    # near-uniform categorical over the whole vocab.
    logp = jnp.where(p_fin > 0, jnp.log(p_fin), -jnp.inf)
    fin = jnp.where(
        jnp.sum(p_fin, axis=-1) > 0,
        jax.random.categorical(rs, logp, axis=-1),
        jnp.argmax(probs[rows, pos], axis=-1),
    ).astype(jnp.int32)
    tokens = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1)
    tokens = tokens.at[rows, j].set(fin)
    return tokens, j + 1


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "lcfg", "max_new_tokens", "eos_id",
                     "draft_len", "ngram", "decode_impl", "sparams"),
)
def _spec_loop(
    params, lora, first_logits, cache, ctx, cur, rng,
    *, cfg: ModelConfig, lcfg: LoraConfig, max_new_tokens: int,
    eos_id: int, draft_len: int, ngram: int,
    decode_impl: Optional[str] = None,
    sparams: Optional[SamplingParams] = None,
):
    """ctx [B, C]: prompt tokens (row b valid through cur[b]); cache holds
    the prefilled prompt KV with per-row length == cur.  Returns
    (out [B, max_new_tokens] eos-padded, cache)."""
    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )
    from qlora_tpu.ops.qmatmul import default_impl

    B, C = ctx.shape
    k = draft_len
    if decode_impl is None:
        params = unstack_params(params)   # int8 trees arrive pre-split
    lora = unstack_lora(lora, cfg.num_layers)
    cache = unstack_cache(cache)
    impl_ctx = (functools.partial(default_impl, "w8a8") if decode_impl
                else contextlib.nullcontext)

    sampled = sparams is not None and sparams.do_sample

    # first token comes from the prefill logits (matches decode_loop)
    if sampled:
        rng, sub0 = jax.random.split(rng)
        p0 = _target_probs(first_logits, sparams)
        t0 = jax.random.categorical(
            sub0, jnp.where(p0 > 0, jnp.log(p0), -jnp.inf), axis=-1
        ).astype(jnp.int32)
    else:
        t0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)  # [B]
    out = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    out = out.at[:, 0].set(t0)
    done = (t0 == eos_id) | (max_new_tokens <= 1)
    n_out = jnp.ones((B,), jnp.int32)
    # pending token joins the context; cache length stays at the prompt
    # (the pending token's KV is written by its own verify chunk)
    ctx = ctx.at[jnp.arange(B), cur].set(t0)
    cur = cur + 1

    rows = jnp.arange(B)
    span = jnp.arange(C - ngram + 1)

    def draft(ctx, cur):
        """Latest earlier occurrence of the trailing ngram → next k tokens."""
        match = jnp.ones((B, C - ngram + 1), bool)
        for g in range(ngram):
            last_g = ctx[rows, cur - ngram + g]                  # [B]
            match &= ctx[:, g:C - ngram + 1 + g] == last_g[:, None]
        # strictly earlier than the trailing occurrence itself
        match &= span[None, :] < (cur - ngram)[:, None]
        best = jnp.max(jnp.where(match, span[None, :], -1), axis=1)
        start = jnp.clip(best + ngram, 0, C - k)   # -1 → garbage draft (ok:
        # drafts are only proposals; verification enforces exact greedy)
        return jax.vmap(
            lambda c, s: jax.lax.dynamic_slice(c, (s,), (k,))
        )(ctx, start)

    def cond(state):
        _, _, _, _, _, done, _, _ = state
        return ~jnp.all(done)

    def body(state):
        ctx, cur, cache, out, n_out, done, it, rng = state
        pending = ctx[rows, cur - 1][:, None]                    # [B, 1]
        drafts = draft(ctx, cur)                                 # [B, k]
        inp = jnp.concatenate([pending, drafts], axis=1)         # [B, k+1]
        len_before = cache["length"]
        with impl_ctx():
            logits, cache = forward(params, lora, inp, cfg, lcfg,
                                    cache=cache)
        # logits[:, i] = model's distribution after consuming inp[:, :i+1]
        if sampled:
            rng, sub = jax.random.split(rng)
            probs = _target_probs(
                logits.reshape(B * (k + 1), -1), sparams
            ).reshape(B, k + 1, -1)
            toks, n_acc = accept_and_resample(sub, probs, drafts)
        else:
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
            # draft i is confirmed iff it equals the argmax and all
            # earlier drafts were confirmed
            acc = jnp.cumprod(drafts == toks[:, :-1], axis=1)     # [B, k]
            n_acc = 1 + jnp.sum(acc, axis=1)                      # 1..k+1
        idx = jnp.arange(k + 1)
        # cut at the first accepted eos (the eos itself is emitted, like
        # decode_loop), then cap by the remaining output budget
        eos_pos = jnp.min(
            jnp.where((toks == eos_id) & (idx[None] < n_acc[:, None]),
                      idx[None], k + 1), axis=1)
        n_acc = jnp.minimum(n_acc, eos_pos + 1)
        n_eff = jnp.minimum(n_acc, max_new_tokens - n_out)
        n_eff = jnp.where(done, 0, n_eff)

        wmask = idx[None] < n_eff[:, None]                       # [B, k+1]
        out = out.at[
            rows[:, None],
            jnp.where(wmask, n_out[:, None] + idx[None], max_new_tokens),
        ].set(jnp.where(wmask, toks, 0), mode="drop")
        ctx = ctx.at[
            rows[:, None],
            jnp.where(wmask, cur[:, None] + idx[None], C),
        ].set(jnp.where(wmask, toks, 0), mode="drop")
        done = done | jnp.any((toks == eos_id) & wmask, axis=1)
        n_out = n_out + n_eff
        cur = cur + n_eff
        done = done | (n_out >= max_new_tokens)
        # roll the cache back to the verified prefix: the chunk wrote k+1
        # positions but only [pending, accepted drafts] are real context
        cache = dict(cache, length=len_before + n_eff)
        return ctx, cur, cache, out, n_out, done, it + 1, rng

    state = (ctx, cur, cache, out, n_out, done, jnp.int32(0), rng)
    state = jax.lax.while_loop(cond, body, state)
    return state[3], state[2], state[6]


def generate_speculative(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens: int = 256, eos_id: int = 2, max_len: Optional[int] = None,
    draft_len: int = 8, ngram: int = 2,
    decode_impl: Optional[str] = None, decode_params: Optional[dict] = None,
    sparams: Optional[SamplingParams] = None, rng: Optional[jax.Array] = None,
    with_stats: bool = False,
) -> "jax.Array | tuple[jax.Array, dict]":
    """Greedy generation with prompt-lookup speculation.

    Returns tokens [B, max_new_tokens]; with ``with_stats`` a
    ``(tokens, {"chunks": int})`` tuple instead — note the stats path
    forces one host sync (``int(chunks)``) to materialize the count.

    Token-identical to greedy ``generate()`` up to kernel numerics
    (verification only ever accepts the model's own argmax, but the
    chunked verify pass and the T=1 fused decode kernel have different
    bf16 accumulation orders, so an argmax decided by a near-tie can
    differ between the two paths — the standard speculative-decoding
    caveat; tests/test_speculative.py pins it).  Retires up to
    draft_len+1 tokens per weight pass when the continuation re-uses
    earlier text.

    SAMPLED decoding (sparams.do_sample) runs speculative REJECTION
    sampling (accept_and_resample): each draft is accepted with the
    target distribution's own probability of that token, and the first
    rejection resamples from the renormalized residual — the output
    sequence distribution is exactly ancestral sampling from the
    temperature/top-k/top-p-adjusted distribution, regardless of the
    drafts.  repetition_penalty / no_repeat_ngram_size do not compose
    with speculation (they make the target distribution depend on tokens
    emitted INSIDE the chunk) — use generate() for those.
    """
    from qlora_tpu.generate.engine import prefill

    if sparams is not None and sparams.do_sample and (
            sparams.repetition_penalty != 1.0
            or sparams.no_repeat_ngram_size > 0):
        raise NotImplementedError(
            "repetition_penalty / no_repeat_ngram_size do not compose with "
            "speculative decoding (in-chunk history dependence); use "
            "generate()")
    B, S = ids.shape
    # room for the deepest possible overshoot: one full chunk past the cap
    max_len = max_len or (S + max_new_tokens + draft_len + 1)
    cache = init_cache(cfg, B, max_len)
    last_logits, cache = prefill(params, lora, ids, lengths, cfg, lcfg,
                                 cache=cache)
    dec_params = params
    if decode_impl == "int8":
        if decode_params is None:
            from qlora_tpu.generate.serve_int8 import (
                requantize_params_int8_unstacked,
            )

            decode_params = requantize_params_int8_unstacked(params)
        dec_params = decode_params
    elif decode_impl is not None:
        raise ValueError(f"decode_impl={decode_impl!r}: only 'int8' or None")
    ctx = jnp.zeros((B, max_len), jnp.int32)
    ctx = jax.vmap(
        lambda c, row, ln: jax.lax.dynamic_update_slice(c, row, (0,))
    )(ctx, ids, lengths)  # prompts are right-padded; pads beyond cur unused
    toks, _, it = _spec_loop(
        dec_params, lora, last_logits, cache, ctx, lengths,
        rng if rng is not None else jax.random.PRNGKey(0),
        cfg=cfg, lcfg=lcfg, max_new_tokens=max_new_tokens, eos_id=eos_id,
        draft_len=draft_len, ngram=ngram, decode_impl=decode_impl,
        sparams=sparams,
    )
    if with_stats:
        # verify chunks taken; tokens-per-chunk = generated / chunks
        return toks, {"chunks": int(it)}
    return toks


def generate_stream_speculative(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens: int = 256, eos_id: int = 2, max_len: Optional[int] = None,
    draft_len: int = 8, ngram: int = 2,
    decode_impl: Optional[str] = None, decode_params: Optional[dict] = None,
    sparams: Optional[SamplingParams] = None, rng: Optional[jax.Array] = None,
):
    """Streaming prompt-lookup speculation (B=1): yields accepted tokens as
    each verify chunk lands — the chat-demo path, where every device
    dispatch pays a fixed host/relay cost and a chunk retires 1..k+1
    tokens instead of 1.  Same acceptance semantics as
    generate_speculative (greedy-exact / rejection-sampled); drafts are
    matched host-side, but the OUTPUT does not depend on draft quality —
    only the number of chunks does."""
    import numpy as np

    from qlora_tpu.generate.engine import prefill
    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )
    from qlora_tpu.ops.qmatmul import default_impl

    B, S = ids.shape
    assert B == 1, "streaming speculation is single-stream (B=1)"
    if sparams is not None and sparams.do_sample and (
            sparams.repetition_penalty != 1.0
            or sparams.no_repeat_ngram_size > 0):
        raise NotImplementedError(
            "repetition_penalty / no_repeat_ngram_size do not compose with "
            "speculative decoding; use generate_stream()")
    sampled = sparams is not None and sparams.do_sample
    k = draft_len
    max_len = max_len or (S + max_new_tokens + k + 1)
    cache = init_cache(cfg, B, max_len)
    logits0, cache = prefill(params, lora, ids, lengths, cfg, lcfg,
                             cache=cache)
    if decode_impl == "int8":
        if decode_params is None:
            from qlora_tpu.generate.serve_int8 import (
                requantize_params_int8_unstacked,
            )

            decode_params = requantize_params_int8_unstacked(params)
        params = decode_params
    elif decode_impl is not None:
        raise ValueError(f"decode_impl={decode_impl!r}: only 'int8' or None")
    else:
        params = unstack_params(params)
    impl_ctx = (functools.partial(default_impl, "w8a8") if decode_impl
                else contextlib.nullcontext)
    lora = unstack_lora(lora, cfg.num_layers)
    cache = unstack_cache(cache)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(cache, inp, sub):
        with impl_ctx():
            logits, cache = forward(params, lora, inp, cfg, lcfg,
                                    cache=cache)
        if sampled:
            probs = _target_probs(logits[0], sparams)[None]     # [1,k+1,V]
            toks, n_acc = accept_and_resample(sub, probs, inp[:, 1:])
            return toks[0], n_acc[0], cache
        toks = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k+1]
        acc = jnp.cumprod(inp[0, 1:] == toks[:-1])
        return toks, 1 + jnp.sum(acc), cache

    # host-side context and draft lookup (same latest-earlier-occurrence
    # rule as the in-graph matcher); the verified cache length lives as a
    # HOST int — the cache dict is donated every chunk, so holding a
    # reference to its old `length` buffer would read deleted memory
    ctx = list(np.asarray(ids[0, : int(lengths[0])]))
    cur_len = int(lengths[0])

    def host_draft():
        if len(ctx) < ngram + 1:
            return [0] * k
        tail = ctx[-ngram:]
        for i in range(len(ctx) - ngram - 1, -1, -1):
            if ctx[i:i + ngram] == tail:
                d = ctx[i + ngram:i + ngram + k]
                return (d + [0] * k)[:k]
        return [0] * k

    # first token from the prefill logits
    if sampled:
        rng, sub0 = jax.random.split(rng)
        p0 = _target_probs(logits0, sparams)
        t0 = int(jax.random.categorical(
            sub0, jnp.where(p0 > 0, jnp.log(p0), -jnp.inf), axis=-1)[0])
    else:
        t0 = int(jnp.argmax(logits0[0]))
    yield np.asarray([t0])
    n_out = 1
    if t0 == eos_id or n_out >= max_new_tokens:
        return
    ctx.append(t0)

    while n_out < max_new_tokens:
        drafts = host_draft()
        inp = jnp.asarray([[ctx[-1], *drafts]], jnp.int32)
        rng, sub = jax.random.split(rng)
        cache = dict(cache, length=jnp.full((1,), cur_len, jnp.int32))
        toks, n_acc, cache = chunk(cache, inp, sub)
        toks = np.asarray(toks)
        n = min(int(n_acc), max_new_tokens - n_out)
        stop = False
        for i in range(n):
            t = int(toks[i])
            yield np.asarray([t])
            n_out += 1
            if t == eos_id:
                stop = True
                n = i + 1
                break
            ctx.append(t)
        cur_len += n     # roll back to the verified prefix
        if stop:
            return
