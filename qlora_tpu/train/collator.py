"""Causal-LM collator — reference-parity with DataCollatorForCausalLM
(/root/reference/qlora.py:447-498), re-designed for static TPU shapes.

Semantics preserved:
* source tokenized as ``{bos_token}{input}``, target as ``{output}{eos_token}``
  with independent ``source_max_len`` / ``target_max_len`` truncation
  (qlora.py:455-468);
* ``input_ids = source + target``; labels mask the source with -100 unless
  ``train_on_source`` (qlora.py:476-486);
* ``predict_with_generate`` emits source-only inputs (qlora.py:487-488);
* right padding; ``attention_mask = ids != pad`` (qlora.py:490-495).

TPU change: every batch is padded to a **fixed** length (static shapes for
jit); length-bucketed batching (`length` column, qlora.py:659) lives in the
sampler, which picks one of a small set of bucket lengths to bound
recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Protocol, Sequence

import numpy as np

from qlora_tpu.train.loss import IGNORE_INDEX


class TokenizerLike(Protocol):
    bos_token_id: int
    eos_token_id: int
    pad_token_id: int

    def encode(self, text: str) -> list[int]: ...


@dataclasses.dataclass
class CausalCollator:
    tokenizer: TokenizerLike
    source_max_len: int = 1024       # qlora.py:111-114 default
    target_max_len: int = 256        # qlora.py:115-118 default
    train_on_source: bool = False    # qlora.py:119-122
    predict_with_generate: bool = False
    pad_to: Optional[int] = None     # fixed pad length (default: src+tgt max)

    def __call__(self, instances: Sequence[dict]) -> dict:
        tok = self.tokenizer
        srcs, tgts = [], []
        for ex in instances:
            s = tok.encode(ex["input"])[: self.source_max_len - 1]
            srcs.append([tok.bos_token_id] + s)
            t = tok.encode(ex["output"])[: self.target_max_len - 1]
            tgts.append(t + [tok.eos_token_id])

        if self.predict_with_generate:
            seqs = srcs
            labels = None
        else:
            seqs = [s + t for s, t in zip(srcs, tgts)]
            if self.train_on_source:
                labels = [list(seq) for seq in seqs]
            else:
                labels = [
                    [IGNORE_INDEX] * len(s) + list(t)
                    for s, t in zip(srcs, tgts)
                ]

        maxlen = self.pad_to or (
            self.source_max_len
            + (0 if self.predict_with_generate else self.target_max_len)
        )
        B = len(seqs)
        input_ids = np.full((B, maxlen), tok.pad_token_id, np.int32)
        attention_mask = np.zeros((B, maxlen), np.int32)
        out_labels = np.full((B, maxlen), IGNORE_INDEX, np.int32)
        for i, seq in enumerate(seqs):
            seq = seq[:maxlen]
            input_ids[i, : len(seq)] = seq
            attention_mask[i, : len(seq)] = 1
            if labels is not None:
                lab = labels[i][:maxlen]
                out_labels[i, : len(lab)] = lab

        batch = {"input_ids": input_ids, "attention_mask": attention_mask}
        if labels is not None:
            batch["labels"] = out_labels
        return batch


def example_length(tokenizer: TokenizerLike, ex: dict, with_target: bool = True) -> int:
    """The reference's `length` column for grouped batching (qlora.py:659)."""
    n = 1 + len(tokenizer.encode(ex["input"]))
    if with_target:
        n += len(tokenizer.encode(ex["output"])) + 1
    return n


def bucket_batches(
    lengths: list[int],
    batch_size: int,
    buckets: Sequence[int],
    seed: int = 0,
    drop_last: bool = False,
):
    """Length-grouped batching with static bucket lengths.

    Replaces transformers' ``group_by_length`` sampler (qlora.py:211): sort
    indices by length, slice into batches of near-equal lengths, assign each
    batch the smallest bucket ≥ its max length, then shuffle batch order.
    Returns list of (indices, bucket_len).
    """
    rng = np.random.default_rng(seed)
    order = np.argsort(np.asarray(lengths), kind="stable")
    batches = []
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if drop_last and len(idx) < batch_size:
            continue
        mx = max(lengths[j] for j in idx)
        blen = next((b for b in sorted(buckets) if b >= mx), max(buckets))
        batches.append((idx.tolist(), blen))
    rng.shuffle(batches)
    return batches
