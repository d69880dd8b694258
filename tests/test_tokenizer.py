"""Tokenizer parity (VERDICT round-1 item 6, reference qlora.py:347-374):
slow-path default, slow≡fast ids on Guanaco-format text, special-token
repair from model-config ids, pad handling.

Offline fixture: a byte-level GPT2 tokenizer built from an in-test vocab
(no hub access) — it has both slow and fast classes, so the forced-slow
default and the parity claim are both checkable."""

import json
import os

import pytest

transformers = pytest.importorskip("transformers")

GUANACO_TEXTS = [
    "### Human: What is the capital of France?### Assistant: Paris.",
    "A riddle:\n  what walks on four legs?\t(answer below)",
    "unicode: héllo wörld — ¿qué tal? 你好",
    "",
    "   leading and trailing spaces   ",
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("tok")
    be = bytes_to_unicode()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in sorted(be):
        vocab[be[b]] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = transformers.GPT2Tokenizer(
        str(d / "vocab.json"), str(d / "merges.txt"),
        unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    tok.save_pretrained(str(d))
    return str(d)


def test_loader_defaults_to_slow_path(tok_dir):
    from qlora_tpu.utils.tokenizer import load_tokenizer

    tok, n_added = load_tokenizer(tok_dir)
    assert not tok._tok.is_fast, "reference forces use_fast=False (qlora.py:351)"
    # pad repair: no pad token in the fixture, unk exists → pad = unk (id 0)
    assert tok.pad_token_id == 0
    assert n_added == 0


def test_slow_fast_id_parity_on_guanaco_text(tok_dir):
    from qlora_tpu.utils.tokenizer import load_tokenizer

    slow, _ = load_tokenizer(tok_dir)
    fast, _ = load_tokenizer(tok_dir, use_fast=True)
    assert fast._tok.is_fast
    for text in GUANACO_TEXTS:
        assert slow.encode(text) == fast.encode(text), repr(text)
        assert slow.decode(slow.encode(text)) == fast.decode(fast.encode(text))


def test_special_token_repair_from_model_config(tok_dir):
    """eos/bos/unk re-pointed at the model config's ids (qlora.py:362-374)."""
    from qlora_tpu.utils.tokenizer import load_tokenizer

    # pretend the model config says eos=2, bos=1, pad=0 (LLaMA convention,
    # incl. the bos_token_id=1 fix from README.md:138)
    tok, _ = load_tokenizer(
        tok_dir, config_eos_id=2, config_bos_id=1, config_pad_id=0,
    )
    assert tok.eos_token_id == 2
    assert tok.bos_token_id == 1
    assert tok._tok.unk_token_id == 0
    assert tok.pad_token_id == 0


def test_repair_can_repoint_to_nonstandard_ids(tok_dir):
    from qlora_tpu.utils.tokenizer import load_tokenizer

    # a config whose eos is some ordinary token id
    tok, _ = load_tokenizer(tok_dir, config_eos_id=10)
    assert tok.eos_token_id == 10
