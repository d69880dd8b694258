"""Generation engine: prefill + jit token-at-a-time decode with KV cache.

The inference API surface the reference defines (SURVEY.md §3.5):
* batch predict   — ``generate()`` (one jit'd while_loop, fastest path)
* streaming       — ``generate_stream()`` (python loop over a jit step,
                    yields tokens as they decode; TextIteratorStreamer
                    equivalent of the demo notebook)
* continuous batching — ``ContinuousBatcher`` (slot-based KV cache,
                    per-slot lengths; BASELINE.json north star)
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward, init_cache
from qlora_tpu.generate.sampler import SamplingParams, sample_token


def _token_seen_mask(ids: jax.Array, vocab: int) -> jax.Array:
    """[B, S] ids → [B, V] bool: token appeared (pad/negative ids ignored)."""
    one = jax.nn.one_hot(jnp.clip(ids, 0, vocab - 1), vocab, dtype=jnp.bool_)
    valid = (ids >= 0)[..., None]
    return jnp.any(one & valid, axis=1)


def prefill(params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *, cache):
    """Run the prompt through the model, filling the cache.

    ids [B, S] right-padded, lengths [B] true lengths.  Returns
    (last_logits [B, V], cache with per-row length set).
    """
    B, S = ids.shape
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    # valid-key mask is handled by causal mask vs positions; pads sit at
    # positions >= length and are never attended by later decode steps.
    logits, cache = forward(
        params, lora, ids, cfg, lcfg, cache=cache, positions=positions
    )
    cache = dict(cache, length=lengths)
    last = jnp.take_along_axis(logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
    return last, cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "lcfg", "sparams", "max_new_tokens", "eos_id",
        "min_new_tokens", "decode_impl",
    ),
)
def decode_loop(
    params,
    lora,
    first_logits,
    cache,
    prompt_seen,           # [B, V] bool for repetition penalty
    rng,
    *,
    cfg: ModelConfig,
    lcfg: LoraConfig,
    sparams: SamplingParams,
    max_new_tokens: int,
    eos_id: int,
    min_new_tokens: int = 0,
    decode_impl: Optional[str] = None,
):
    """jit'd while_loop decode. Returns tokens [B, max_new_tokens] (eos-padded).

    decode_impl="int8": params must be the OFFLINE-requantized per-layer
    serving tree (serve_int8.requantize_params_int8_unstacked) — decode
    runs through the direct int8 MXU kernels, the same trade the serving
    engines make (~1.2% rel. logit error, weight reads near HBM SOL)."""
    import contextlib

    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )
    from qlora_tpu.ops.qmatmul import default_impl

    B = first_logits.shape[0]
    V = cfg.vocab_size
    # per-layer trees for the UNROLLED decode path: one in-graph split here
    # (amortized over the whole rollout) buys copy-free per-step kernels —
    # lax.scan's per-layer slices of stacked weights/cache materialized as
    # HBM copies that dominated the decode step (47.6 → 17.4 ms at 7B)
    if decode_impl is None:
        params = unstack_params(params)   # int8 trees arrive pre-split
    lora = unstack_lora(lora, cfg.num_layers)
    cache = unstack_cache(cache)
    impl_ctx = (functools.partial(default_impl, "w8a8") if decode_impl
                else contextlib.nullcontext)

    def cond(state):
        t, _, _, _, _, done, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, logits, cache, seen, rng, done, out = state
        rng, sub = jax.random.split(rng)
        if min_new_tokens > 0 and eos_id >= 0:
            # suppress eos until the minimum length is reached
            logits = jnp.where(
                (t < min_new_tokens)
                & (jnp.arange(V)[None, :] == eos_id),
                -jnp.inf, logits,
            )
        if sparams.no_repeat_ngram_size > 0:
            from qlora_tpu.generate.sampler import ban_repeated_ngrams

            logits = ban_repeated_ngrams(
                logits, out, t, sparams.no_repeat_ngram_size
            )
        tok = sample_token(sub, logits, sparams, seen)
        tok = jnp.where(done, eos_id, tok)
        out = out.at[:, t].set(tok)
        done = done | (tok == eos_id)
        seen = seen | jax.nn.one_hot(tok, V, dtype=jnp.bool_)
        with impl_ctx():
            new_logits, cache = forward(
                params, lora, tok[:, None], cfg, lcfg, cache=cache
            )
        return (t + 1, new_logits[:, 0], cache, seen, rng, done, out)

    out = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    state = (
        jnp.int32(0), first_logits, cache, prompt_seen, rng,
        jnp.zeros((B,), bool), out,
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[6], state[2]


def generate(
    params,
    lora,
    ids: jax.Array,              # [B, S] right-padded prompts
    lengths: jax.Array,          # [B]
    cfg: ModelConfig,
    lcfg: LoraConfig = LoraConfig(),
    *,
    max_new_tokens: int = 256,
    eos_id: int = 2,
    sparams: SamplingParams = SamplingParams(),
    rng: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
    min_new_tokens: int = 0,
    num_beams: int = 1,
    length_penalty: float = 1.0,
    num_beam_groups: int = 1,
    diversity_penalty: float = 0.0,
    penalty_alpha: Optional[float] = None,
    decode_impl: Optional[str] = None,
    decode_params: Optional[dict] = None,   # pre-built int8 serving tree
                                            # (skip per-call requantize)
) -> jax.Array:
    """Batch generation (the reference's trainer.predict path, qlora.py:817-834).

    Returns new tokens [B, max_new_tokens], eos-padded after stop.
    Dispatches on the reference's GenerationArguments (qlora.py:216-246):
    num_beams>1 → beam search; num_beam_groups>1 → diverse beam search;
    penalty_alpha → contrastive search.
    """
    if decode_impl is not None and (
            num_beams > 1 or num_beam_groups > 1 or penalty_alpha):
        raise NotImplementedError(
            "decode_impl composes with greedy/sampled decode only; "
            "beam/contrastive search runs the exact bf16 path")
    if penalty_alpha:
        from qlora_tpu.generate.search import contrastive_search

        return contrastive_search(
            params, lora, ids, lengths, cfg, lcfg,
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            top_k=max(sparams.top_k, 2), penalty_alpha=penalty_alpha,
            max_len=max_len,
        )
    if num_beam_groups > 1:
        from qlora_tpu.generate.search import group_beam_search

        return group_beam_search(
            params, lora, ids, lengths, cfg, lcfg,
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            num_beams=num_beams, num_beam_groups=num_beam_groups,
            diversity_penalty=diversity_penalty,
            length_penalty=length_penalty, max_len=max_len,
        )
    if num_beams > 1:
        return beam_search(
            params, lora, ids, lengths, cfg, lcfg,
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            num_beams=num_beams, max_len=max_len,
            length_penalty=length_penalty,
        )
    B, S = ids.shape
    max_len = max_len or (S + max_new_tokens)
    cache = init_cache(cfg, B, max_len)
    # prefill stays bf16-exact regardless of decode_impl (the serving
    # engines make the same split: quality-critical prompt pass exact,
    # bandwidth-bound token loop int8)
    last_logits, cache = prefill(params, lora, ids, lengths, cfg, lcfg, cache=cache)
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
    seen = _token_seen_mask(
        jnp.where(jnp.arange(S)[None] < lengths[:, None], ids, -1), cfg.vocab_size
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    toks, _ = decode_loop(
        dec_params, lora, last_logits, cache, seen, rng,
        cfg=cfg, lcfg=lcfg, sparams=sparams,
        max_new_tokens=max_new_tokens, eos_id=eos_id,
        min_new_tokens=min_new_tokens, decode_impl=decode_impl,
    )
    return toks


def beam_search(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens=256, eos_id=2, num_beams=4, max_len=None,
    length_penalty: float = 1.0, paged_kv: bool = True,
    page_size: int = 16,
):
    """Beam-search generation (GenerationArguments num_beams, qlora.py:230).

    Plain beam search = single-group diverse beam search with EOS-time
    hypothesis finalization (HF BeamSearchScorer semantics).  By default
    beams run on the copy-on-write paged KV (prompt pages shared, reorder
    = page-table gather + one partial-page copy instead of rewriting the
    whole context); ``paged_kv=False`` keeps the contiguous cache."""
    from qlora_tpu.generate.search import group_beam_search

    return group_beam_search(
        params, lora, ids, lengths, cfg, lcfg,
        max_new_tokens=max_new_tokens, eos_id=eos_id,
        num_beams=num_beams, num_beam_groups=1, diversity_penalty=0.0,
        length_penalty=length_penalty, max_len=max_len,
        paged_kv=paged_kv, page_size=page_size,
    )


def generate_stream(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens=256, eos_id=2, sparams=SamplingParams(), rng=None,
    max_len=None, decode_impl=None, decode_params=None,
) -> Iterator[np.ndarray]:
    """Streaming generation: yields [B] token ids per step (the demo
    notebook's TextIteratorStreamer equivalent).

    decode_impl="int8" opts the token loop into the direct int8 MXU
    serving kernels (prefill stays bf16-exact); pass decode_params (a
    serve_int8.requantize_params_int8_unstacked tree) to reuse one
    serving copy across calls."""
    import contextlib

    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )
    from qlora_tpu.ops.qmatmul import default_impl

    B, S = ids.shape
    max_len = max_len or (S + max_new_tokens)
    cache = init_cache(cfg, B, max_len)
    logits, cache = prefill(params, lora, ids, lengths, cfg, lcfg, cache=cache)
    # split ONCE on the host side (the python loop re-enters jit per token;
    # in-graph splitting would re-slice the stacked weights every step)
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
    seen = _token_seen_mask(
        jnp.where(jnp.arange(S)[None] < lengths[:, None], ids, -1), cfg.vocab_size
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    done = np.zeros((B,), bool)

    # donate the cache: the per-layer lists flow through the fused decode
    # kernels' aliased outputs in place instead of XLA defensively copying
    # every layer's K/V planes each streamed token
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(logits, cache, seen, rng):
        rng, sub = jax.random.split(rng)
        tok = sample_token(sub, logits, sparams, seen)
        seen = seen | jax.nn.one_hot(tok, cfg.vocab_size, dtype=jnp.bool_)
        with impl_ctx():
            new_logits, cache = forward(params, lora, tok[:, None], cfg,
                                        lcfg, cache=cache)
        return tok, new_logits[:, 0], cache, seen, rng

    for _ in range(max_new_tokens):
        tok, logits, cache, seen, rng = step(logits, cache, seen, rng)
        tok_np = np.asarray(tok)
        tok_np = np.where(done, eos_id, tok_np)
        yield tok_np
        done |= tok_np == eos_id
        if done.all():
            return
