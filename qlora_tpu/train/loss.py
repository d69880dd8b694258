"""Masked causal-LM cross-entropy.

IGNORE_INDEX = -100 semantics match the reference collator's source-token
masking (/root/reference/qlora.py:75,479-486): labels equal to -100
contribute nothing; the loss is the mean over non-ignored positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def causal_shift(ids: jax.Array, labels: jax.Array):
    """Next-token prediction alignment: logits[t] predicts labels[t+1]."""
    return ids[:, :-1], labels[:, 1:]


def masked_cross_entropy(logits: jax.Array, labels: jax.Array):
    """Mean CE over positions where labels != IGNORE_INDEX.

    logits [B, S, V] (any float dtype; upcast to f32), labels [B, S] int32.
    Returns (loss_scalar_f32, n_valid_tokens).
    """
    logits = logits.astype(jnp.float32)
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - ll) * mask
    n = jnp.maximum(mask.sum(), 1)
    return nll.sum() / n, mask.sum()
