"""MMLU rank-classification evaluation.

Reference semantics (MMLUEvalCallback, /root/reference/qlora.py:722-783):
* each record is {subject, input, output} with output ∈ {A, B, C, D};
* the collator masks the source; the *first* label token's position gives
  the answer token; the prediction is the argmax over the logits of the
  four answer-token ids at the position **before** that first label token
  (next-token prediction);
* metrics: per-subject accuracy, mean accuracy over subjects, eval loss.

Data files: ``zero_shot_mmlu_{val,test}.json`` / ``five_shot_mmlu_{val,test}.json``
(the reference ships only zero-shot val; pass any file of the same schema).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward
from qlora_tpu.train.collator import CausalCollator
from qlora_tpu.train.loss import IGNORE_INDEX, masked_cross_entropy


def load_mmlu_file(path: str, max_samples: Optional[int] = None) -> list[dict]:
    with open(path) as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        # the reference's zero_shot_mmlu_val.json is JSON LINES (one record
        # per line), not a JSON document — json.load raised "Extra data"
        data = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
    # the reference file is a dict of columns or a list of records
    if isinstance(data, dict):
        keys = list(data)
        n = len(data[keys[0]])
        data = [{k: data[k][i] for k in keys} for i in range(n)]
    return data[:max_samples] if max_samples else data


def abcd_token_ids(tokenizer) -> list[int]:
    """First token id of each of 'A'..'D' (qlora.py:739-744)."""
    return [tokenizer.encode(c)[0] for c in "ABCD"]


def evaluate_mmlu(
    params,
    lora,
    cfg: ModelConfig,
    tokenizer,
    examples: list[dict],
    *,
    lcfg: LoraConfig = LoraConfig(),
    batch_size: int = 8,
    source_max_len: int = 2048,   # qlora.py:153-156 mmlu_source_max_len
) -> dict:
    """Returns {"mmlu_loss", "mmlu_eval_accuracy_<subject>": ..., "mmlu_eval_accuracy"}."""
    collator = CausalCollator(
        tokenizer, source_max_len=source_max_len, target_max_len=16,
        pad_to=source_max_len + 16,
    )
    abcd = jnp.asarray(abcd_token_ids(tokenizer))

    @jax.jit
    def batch_logits(lora, params, ids, mask):
        logits, _ = forward(params, lora, ids, cfg, lcfg, attn_mask=mask)
        return logits

    total_loss, total_n = 0.0, 0
    preds, refs, subjects = [], [], []
    for i in range(0, len(examples), batch_size):
        chunk = examples[i : i + batch_size]
        batch = collator(chunk)
        ids = jnp.asarray(batch["input_ids"])
        mask = jnp.asarray(batch["attention_mask"])
        labels = np.asarray(batch["labels"])
        logits = np.asarray(batch_logits(lora, params, ids, mask), np.float32)

        loss, n = masked_cross_entropy(
            jnp.asarray(logits[:, :-1]), jnp.asarray(labels[:, 1:])
        )
        total_loss += float(loss) * int(n)
        total_n += int(n)

        for b, ex in enumerate(chunk):
            label_pos = np.nonzero(labels[b] != IGNORE_INDEX)[0]
            if len(label_pos) == 0:
                continue
            p = int(label_pos[0])
            # logits at the position BEFORE the first label token predict it
            option_logits = logits[b, p - 1][np.asarray(abcd)]
            preds.append(int(option_logits.argmax()))
            refs.append("ABCD".index(ex["output"].strip()[0]))
            subjects.append(ex.get("subject", "all"))

    by_subject = defaultdict(lambda: [0, 0])
    for p, r, s in zip(preds, refs, subjects):
        by_subject[s][0] += int(p == r)
        by_subject[s][1] += 1

    results = {"mmlu_loss": total_loss / max(total_n, 1)}
    accs = []
    for s, (c, n) in sorted(by_subject.items()):
        acc = c / n
        results[f"mmlu_eval_accuracy_{s}"] = acc
        accs.append(acc)
    results["mmlu_eval_accuracy"] = float(np.mean(accs)) if accs else 0.0
    return results
