"""Collator + data pipeline tests (masking semantics per SURVEY.md §4)."""

import json

import numpy as np
import pytest

from qlora_tpu.train.collator import CausalCollator, bucket_batches, example_length
from qlora_tpu.train.data import (
    ALPACA_PROMPT_DICT,
    extract_alpaca_example,
    format_example,
    load_local_dataset,
    make_dataset,
    split_train_eval,
)
from qlora_tpu.train.loss import IGNORE_INDEX


from qlora_tpu.utils.testing import FakeTokenizer  # re-export for tests


@pytest.fixture
def tok():
    return FakeTokenizer()


def test_collator_masks_source(tok):
    c = CausalCollator(tok, source_max_len=16, target_max_len=8)
    batch = c([{"input": "ab", "output": "xy"}])
    ids = batch["input_ids"][0]
    labels = batch["labels"][0]
    src = [1] + tok.encode("ab")
    tgt = tok.encode("xy") + [2]
    np.testing.assert_array_equal(ids[: len(src) + len(tgt)], src + tgt)
    assert (labels[: len(src)] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(labels[len(src) : len(src) + len(tgt)], tgt)
    # padding
    assert (ids[len(src) + len(tgt):] == tok.pad_token_id).all()
    assert (labels[len(src) + len(tgt):] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(
        batch["attention_mask"][0][: len(src) + len(tgt)], 1
    )
    assert (batch["attention_mask"][0][len(src) + len(tgt):] == 0).all()


def test_collator_train_on_source(tok):
    c = CausalCollator(tok, source_max_len=16, target_max_len=8, train_on_source=True)
    batch = c([{"input": "ab", "output": "x"}])
    n = batch["attention_mask"][0].sum()
    labels = batch["labels"][0]
    ids = batch["input_ids"][0]
    np.testing.assert_array_equal(labels[:n], ids[:n])


def test_collator_predict_with_generate(tok):
    c = CausalCollator(tok, source_max_len=16, target_max_len=8, predict_with_generate=True)
    batch = c([{"input": "abc", "output": "ignored"}])
    assert "labels" not in batch
    n = batch["attention_mask"][0].sum()
    assert n == 1 + 3  # bos + 3 chars, no target appended
    assert batch["input_ids"].shape[1] == 16  # source-only padding


def test_collator_truncation(tok):
    c = CausalCollator(tok, source_max_len=4, target_max_len=3)
    batch = c([{"input": "abcdefgh", "output": "wxyz"}])
    n = batch["attention_mask"][0].sum()
    assert n == 4 + 3  # bos+3 source, 2 target + eos
    assert batch["input_ids"][0][n - 1] == tok.eos_token_id


def test_alpaca_prompt_formats():
    ex = {"instruction": "Do X", "input": "with Y", "output": "done"}
    got = extract_alpaca_example(ex)
    assert got["input"] == ALPACA_PROMPT_DICT["prompt_input"].format(**ex)
    ex2 = {"instruction": "Do X", "input": "", "output": "done"}
    got2 = extract_alpaca_example(ex2)
    assert got2["input"] == ALPACA_PROMPT_DICT["prompt_no_input"].format(**ex2)
    assert got2["output"] == "done"


def test_format_adapters():
    assert format_example(
        {"text": "<human>: hi\n<bot>: hello"}, "chip2"
    ) == {"input": "hi", "output": "hello"}
    assert format_example(
        {"prompt": "p", "completion": "c"}, "self-instruct"
    ) == {"input": "p", "output": "c"}
    assert format_example({"chosen": "c", "rejected": "r"}, "hh-rlhf") == {
        "input": "", "output": "c",
    }
    assert format_example({"text": "t"}, "oasst1") == {"input": "", "output": "t"}


def test_local_dataset_loaders(tmp_path):
    rows = [{"input": "a", "output": "b"}, {"input": "c", "output": "d"}]
    pj = tmp_path / "d.json"
    pj.write_text(json.dumps(rows))
    assert load_local_dataset(str(pj)) == rows
    pl = tmp_path / "d.jsonl"
    pl.write_text("\n".join(json.dumps(r) for r in rows))
    assert load_local_dataset(str(pl)) == rows
    pc = tmp_path / "d.csv"
    pc.write_text("input,output\na,b\nc,d\n")
    assert load_local_dataset(str(pc)) == rows
    train, evals = make_dataset(str(pj), do_eval=True, eval_dataset_size=1)
    assert len(train) == 1 and len(evals) == 1


def test_split_is_deterministic():
    ex = [{"input": str(i), "output": ""} for i in range(100)]
    t1, e1 = split_train_eval(ex, 0.1, seed=42)
    t2, e2 = split_train_eval(ex, 0.1, seed=42)
    assert t1 == t2 and e1 == e2 and len(e1) == 10


def test_bucket_batches(tok):
    exs = [{"input": "a" * n, "output": "bb"} for n in (1, 5, 9, 2, 7, 30)]
    lengths = [example_length(tok, e) for e in exs]
    batches = bucket_batches(lengths, 2, buckets=(8, 16, 32, 64), seed=0)
    assert sum(len(b[0]) for b in batches) == len(exs)
    for idx, blen in batches:
        assert max(lengths[i] for i in idx) <= blen
