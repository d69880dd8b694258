"""Tokenizer wrapper: special-token repair + mean-init embedding resize.

Replicates the reference's tokenizer setup (qlora.py:347-374):
* slow/sentencepiece path, padding side right;
* add ``[PAD]`` if the tokenizer has no pad token (DEFAULT_PAD_TOKEN,
  qlora.py:74,356-361) with mean-initialized embedding rows
  (smart_tokenizer_and_embedding_resize, qlora.py:425-445);
* LLaMA special-token repair: eos/bos/unk ids taken from the model config
  (qlora.py:362-374), incl. the bos_token_id=1 fix (README.md:138).

The sentencepiece/HF `tokenizers` machinery is a pure-CPU dependency (like
the reference's), not framework code.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

DEFAULT_PAD_TOKEN = "[PAD]"


class Tokenizer:
    """Thin adapter over an HF tokenizer exposing the collator protocol."""

    def __init__(self, hf_tokenizer, *, add_special_tokens: bool = False):
        self._tok = hf_tokenizer
        self._add_special = add_special_tokens

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=self._add_special)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(map(int, ids)), skip_special_tokens=skip_special_tokens)

    @property
    def bos_token_id(self) -> int:
        return self._tok.bos_token_id

    @property
    def eos_token_id(self) -> int:
        return self._tok.eos_token_id

    @property
    def pad_token_id(self) -> int:
        return self._tok.pad_token_id

    @property
    def vocab_size(self) -> int:
        return len(self._tok)


def load_tokenizer(
    name_or_path: str,
    *,
    model_vocab_size: Optional[int] = None,
    llama_special_token_fix: bool = True,
    use_fast: bool = False,
    config_eos_id: Optional[int] = None,
    config_bos_id: Optional[int] = None,
    config_pad_id: Optional[int] = None,
):
    """Load an HF tokenizer with the reference's repairs applied.

    Reference parity (qlora.py:347-374): the SLOW tokenizer path is the
    default (``use_fast=False``, forced at qlora.py:351 — fast/slow LLaMA
    tokenizers differ on added-token and whitespace edge cases, a silent
    loss-parity risk).  If the checkpoint ships no slow tokenizer (or
    sentencepiece is unavailable) we fall back to fast with a warning.

    Special-token repair: eos/bos/unk re-pointed at the MODEL CONFIG's ids
    when provided (qlora.py:362-374 — ``convert_ids_to_tokens`` of
    config.eos/bos/pad ids), including the bos_token_id=1 LLaMA fix
    (README.md:138).  Pad handling: reference behavior adds ``[PAD]`` via
    mean-init embedding resize (qlora.py:356-361); when the tokenizer has
    an ``<unk>`` we instead pad with unk id 0 (the reference's own
    documented inference-side convention, examples/guanaco_generate.py:37)
    so pre-quantized checkpoints never need a vocab resize.

    Returns (Tokenizer, n_added_tokens).
    """
    import logging

    from transformers import AutoTokenizer

    try:
        tok = AutoTokenizer.from_pretrained(
            name_or_path, padding_side="right", use_fast=use_fast
        )
    except Exception as e:  # noqa: BLE001 — no slow class / no spm model
        if use_fast:
            raise
        logging.getLogger("qlora_tpu").warning(
            "slow tokenizer unavailable for %s (%s); falling back to fast",
            name_or_path, e,
        )
        tok = AutoTokenizer.from_pretrained(
            name_or_path, padding_side="right", use_fast=True
        )

    # eos/bos/unk repair from the model config's ids (qlora.py:362-374)
    repairs = {}
    if config_eos_id is not None:
        repairs["eos_token"] = tok.convert_ids_to_tokens(config_eos_id)
    if config_bos_id is not None:
        repairs["bos_token"] = tok.convert_ids_to_tokens(config_bos_id)
    if config_pad_id is not None and config_pad_id != -1:
        repairs["unk_token"] = tok.convert_ids_to_tokens(config_pad_id)
    if repairs and llama_special_token_fix:
        tok.add_special_tokens(
            {k: v for k, v in repairs.items() if v is not None}
        )

    n_added = 0
    if tok.pad_token is None:
        if llama_special_token_fix and tok.unk_token is not None:
            # LLaMA convention: pad with <unk> (id 0) — no resize needed
            tok.pad_token = tok.unk_token
        else:
            n_added += tok.add_special_tokens({"pad_token": DEFAULT_PAD_TOKEN})
    if llama_special_token_fix and tok.bos_token_id is None:
        tok.add_special_tokens({"bos_token": "<s>"})
    return Tokenizer(tok), n_added


def resize_embeddings_mean_init(
    embed: jnp.ndarray,        # [V, D]
    lm_head_w: jnp.ndarray,    # [D, V]
    new_vocab: int,
):
    """Grow embedding/lm_head to `new_vocab`, new rows = mean of old rows
    (smart_tokenizer_and_embedding_resize, qlora.py:425-445)."""
    V, D = embed.shape
    if new_vocab <= V:
        return embed, lm_head_w
    n_new = new_vocab - V
    in_mean = jnp.mean(embed.astype(jnp.float32), axis=0, keepdims=True)
    out_mean = jnp.mean(lm_head_w.astype(jnp.float32), axis=1, keepdims=True)
    new_embed = jnp.concatenate(
        [embed, jnp.tile(in_mean, (n_new, 1)).astype(embed.dtype)], axis=0
    )
    new_head = jnp.concatenate(
        [lm_head_w, jnp.tile(out_mean, (1, n_new)).astype(lm_head_w.dtype)], axis=1
    )
    return new_embed, new_head
