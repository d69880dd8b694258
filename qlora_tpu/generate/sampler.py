"""Token sampling: temperature / top-k / top-p / repetition penalty.

Parity with the reference's GenerationArguments surface
(/root/reference/qlora.py:216-246) and HF sampling semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0            # 0 = disabled (HF: 50 default when sampling)
    top_p: float = 1.0
    typical_p: float = 1.0    # typical decoding (GenerationArguments parity)
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array, penalty: float):
    """HF CTRL-style: seen tokens' positive logits /= p, negative *= p.

    logits [B, V]; seen_mask [B, V] bool (token appeared in the sequence).
    """
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top-1)
    cutoff_mask = cum - probs > p
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < cutoff_logit, -jnp.inf, logits)


def typical_p_mask(logits: jax.Array, p: float) -> jax.Array:
    """Typical decoding: keep tokens whose surprisal is closest to the
    entropy, up to cumulative probability p (HF typical_p semantics)."""
    if p >= 1.0:
        return logits
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    ent = -jnp.sum(probs * jnp.where(probs > 0, logp, 0.0), axis=-1, keepdims=True)
    shift = jnp.abs(-logp - ent)
    order = jnp.argsort(shift, axis=-1)                      # ascending deviation
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) < p                    # always keep first
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, -jnp.inf)


def ban_repeated_ngrams(
    logits: jax.Array,          # [B, V]
    history: jax.Array,         # [B, T] generated tokens so far (future = pad)
    cur_len: jax.Array,         # scalar: number of valid tokens in history
    n: int,
) -> jax.Array:
    """no_repeat_ngram_size over the generated sequence: ban any token that
    would complete an n-gram already present in `history`."""
    if n <= 0:
        return logits
    B, V = logits.shape
    T = history.shape[1]
    if T < n:
        return logits
    # the (n-1)-token suffix about to be extended
    suffix = jax.lax.dynamic_slice_in_dim(
        history, jnp.maximum(cur_len - (n - 1), 0), n - 1, axis=1
    )  # [B, n-1]
    starts = jnp.arange(T - n + 1)
    wins = history[:, starts[:, None] + jnp.arange(n - 1)[None, :]]  # [B, S, n-1]
    match = jnp.all(wins == suffix[:, None, :], axis=-1)
    # window must lie fully within generated tokens
    match = match & (starts[None, :] + n - 1 < cur_len) & (cur_len >= n - 1)
    banned = history[:, starts + n - 1]                               # [B, S]
    ban_mask = jnp.zeros((B, V), bool).at[
        jnp.arange(B)[:, None], banned
    ].max(match)
    return jnp.where(ban_mask, -jnp.inf, logits)


def sample_token(
    rng: jax.Array,
    logits: jax.Array,          # [B, V] f32
    params: SamplingParams,
    seen_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns next token ids [B]."""
    if seen_mask is not None and params.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, seen_mask, params.repetition_penalty)
    if not params.do_sample:
        return jnp.argmax(logits, axis=-1)
    if params.temperature != 1.0:
        logits = logits / jnp.maximum(params.temperature, 1e-6)
    logits = top_k_mask(logits, params.top_k)
    logits = top_p_mask(logits, params.top_p)
    logits = typical_p_mask(logits, params.typical_p)
    return jax.random.categorical(rng, logits, axis=-1)
