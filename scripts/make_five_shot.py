"""Generate data/mmlu/five_shot_mmlu_val.json from the zero-shot records.

Per subject, the first 5 records become in-context examples (question +
"Answer: X") prepended to every remaining question — the standard MMLU
five-shot prompt construction (reference default --mmlu_dataset mmlu-fs,
/root/reference/qlora.py:141-144).  The canonical five-shot file uses the
official dev split for shots; this derived file is self-consistent but not
paper-comparable (see data/mmlu/README.md).
"""

import json
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "data", "mmlu", "zero_shot_mmlu_val.json")
DST = os.path.join(HERE, "..", "data", "mmlu", "five_shot_mmlu_val.json")
N_SHOTS = 5


def strip_header(text: str) -> tuple[str, str]:
    """Split the per-record 'The following are ...' header from the question."""
    marker = "\n\n"
    head, _, rest = text.partition(marker)
    return head, rest


def main(src=SRC, dst=DST):
    with open(src) as f:
        text = f.read()
    try:
        records = json.loads(text)
    except json.JSONDecodeError:
        # jsonl layout (the bundled file is one record per line)
        records = [json.loads(line) for line in text.splitlines() if line]
    by_subject = defaultdict(list)
    for r in records:
        by_subject[r["subject"]].append(r)

    out = []
    for subject, rows in by_subject.items():
        if len(rows) <= N_SHOTS:
            continue
        shots, rest = rows[:N_SHOTS], rows[N_SHOTS:]
        header, _ = strip_header(shots[0]["input"])
        shot_text = "".join(
            strip_header(s["input"])[1] + " " + s["output"] + "\n\n"
            for s in shots
        )
        for r in rest:
            _, q = strip_header(r["input"])
            out.append({
                "subject": subject,
                "input": header + "\n\n" + shot_text + q,
                "output": r["output"],
            })
    with open(dst, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} five-shot records to {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:])
