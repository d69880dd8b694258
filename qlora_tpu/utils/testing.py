"""Test/debug helpers that ship with the package (used by --fake_tokenizer)."""


class FakeTokenizer:
    """Byte-level tokenizer: ids = bytes + 3 specials. No files, no network.

    Satisfies the collator protocol; used by tests and the CLI's
    --fake_tokenizer smoke mode.
    """

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def encode(self, text: str):
        return [3 + b for b in text.encode()]

    def decode(self, ids, skip_special_tokens: bool = True):
        # models may have vocab > 259 (byte range + specials); ids outside
        # the byte range decode to nothing (untrained models emit any id)
        return bytes(i - 3 for i in ids if 3 <= i < 259).decode(errors="replace")
