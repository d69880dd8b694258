"""Generate data/mmlu/{zero,five}_shot_mmlu_test.json stand-ins.

The official MMLU test split is only reachable via the hub
(`scripts/get_mmlu_data.py --from_hub`); the reference repo ships only the
zero-shot VAL file yet reads test-split paths too
(/root/reference/qlora.py:722-733).  So that ``--mmlu_split test`` works
out of the box offline, this derives DETERMINISTIC STAND-INS from the
bundled validation records:

* zero-shot test = the odd-indexed post-shot records per subject (the
  even-indexed ones stay the "val-like" half — the bundled val file itself
  is never modified, the pinned-accuracy regression test depends on it);
* five-shot test = the same five-shot prompt construction as
  scripts/make_five_shot.py (first 5 records per subject are the shots)
  applied to that odd half.

Stand-in numbers are self-consistent but NOT paper-comparable, and test
records are a subset of val records — see data/mmlu/README.md.
"""

import json
import os
import sys
from collections import defaultdict

from make_five_shot import strip_header  # noqa: E402  (same directory)

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "data", "mmlu", "zero_shot_mmlu_val.json")
DST_ZS = os.path.join(HERE, "..", "data", "mmlu", "zero_shot_mmlu_test.json")
DST_FS = os.path.join(HERE, "..", "data", "mmlu", "five_shot_mmlu_test.json")
N_SHOTS = 5


def main(src=SRC, dst_zs=DST_ZS, dst_fs=DST_FS):
    with open(src) as f:
        text = f.read()
    try:
        records = json.loads(text)
    except json.JSONDecodeError:
        records = [json.loads(line) for line in text.splitlines() if line]
    by_subject = defaultdict(list)
    for r in records:
        by_subject[r["subject"]].append(r)

    zs, fs = [], []
    for subject, rows in sorted(by_subject.items()):
        if len(rows) <= N_SHOTS:
            continue
        shots, rest = rows[:N_SHOTS], rows[N_SHOTS:]
        header, _ = strip_header(shots[0]["input"])
        shot_text = "".join(
            strip_header(s["input"])[1] + " " + s["output"] + "\n\n"
            for s in shots
        )
        for r in rest[1::2]:                      # odd half → test stand-in
            zs.append(r)
            _, q = strip_header(r["input"])
            fs.append({
                "subject": subject,
                "input": header + "\n\n" + shot_text + q,
                "output": r["output"],
            })
    with open(dst_zs, "w") as f:
        json.dump(zs, f)
    with open(dst_fs, "w") as f:
        json.dump(fs, f)
    print(f"wrote {len(zs)} zero-shot + {len(fs)} five-shot test records")


if __name__ == "__main__":
    main(*sys.argv[1:])
