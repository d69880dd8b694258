"""MMLU data preparation.

The reference ships only ``data/mmlu/zero_shot_mmlu_val.json`` (and reads
four files, two of which are missing from its repo — SURVEY.md component 9).
This tool produces all four in the schema our evaluator consumes
({subject, input, output}), from either:

* ``--from_reference PATH`` — copy/convert the reference's shipped file;
* ``--from_hub``           — build zero- and five-shot val/test splits from
  the ``cais/mmlu`` HF dataset (requires network/dataset cache).

Zero-shot prompt format matches the reference file; five-shot prepends the
dev-split exemplars per subject.
"""

import argparse
import json
import os

CHOICES = ["A", "B", "C", "D"]


def format_example(q, choices, answer_idx, include_answer=True):
    s = q
    for j, ch in enumerate(choices):
        s += f"\n{CHOICES[j]}. {ch}"
    s += "\nAnswer:"
    if include_answer:
        s += f" {CHOICES[answer_idx]}\n\n"
    return s


def build_from_hub(out_dir):
    import datasets

    os.makedirs(out_dir, exist_ok=True)
    ds = datasets.load_dataset("cais/mmlu", "all")
    dev_by_subject = {}
    for r in ds["dev"]:
        dev_by_subject.setdefault(r["subject"], []).append(r)

    def rows(split, shots):
        out = []
        for r in ds[split]:
            prefix = ""
            if shots:
                header = (
                    "The following are multiple choice questions (with answers) "
                    f"about {r['subject'].replace('_', ' ')}.\n\n"
                )
                ex = dev_by_subject.get(r["subject"], [])[:shots]
                prefix = header + "".join(
                    format_example(e["question"], e["choices"], e["answer"])
                    for e in ex
                )
            out.append({
                "subject": r["subject"],
                "input": prefix + format_example(
                    r["question"], r["choices"], r["answer"], include_answer=False
                ),
                "output": CHOICES[r["answer"]],
            })
        return out

    written = []
    for split, hub_split in (("val", "validation"), ("test", "test")):
        for shots, tag in ((0, "zero_shot"), (5, "five_shot")):
            path = os.path.join(out_dir, f"{tag}_mmlu_{split}.json")
            with open(path, "w") as f:
                json.dump(rows(hub_split, shots), f)
            print("wrote", path)
            written.append(os.path.basename(path))
    # stamp the files as canonical so cli._resolve_mmlu_path stops warning
    # about the bundled derived splits
    with open(os.path.join(out_dir, "CANONICAL"), "w") as f:
        f.write("\n".join(written) + "\n")


def build_from_tar(tar_path, out_dir):
    """Build ALL FOUR canonical splits OFFLINE from the official MMLU
    archive (https://people.eecs.berkeley.edu/~hendrycks/data.tar — the
    raw release the paper evaluates on; MIT license).  Layout inside:
    ``data/{dev,val,test}/{subject}_{split}.csv``, headerless rows of
    (question, A, B, C, D, answer-letter).  Five-shot prompts use the
    DEV split's 5 exemplars per subject — exactly the canonical shots the
    reference's default mmlu-fs eval expects (qlora.py:731-733) — so
    numbers become paper-comparable with no network access."""
    import csv
    import io
    import tarfile

    os.makedirs(out_dir, exist_ok=True)
    splits = {"dev": {}, "val": {}, "test": {}}
    with tarfile.open(tar_path) as tf:
        for m in tf.getmembers():
            parts = m.name.split("/")
            if len(parts) < 3 or parts[-2] not in splits or not m.isfile():
                continue
            split = parts[-2]
            fname = parts[-1]
            if not fname.endswith(f"_{split}.csv"):
                continue
            subject = fname[: -len(f"_{split}.csv")]
            text = tf.extractfile(m).read().decode("utf-8")
            rows = []
            for row in csv.reader(io.StringIO(text)):
                if len(row) != 6:
                    raise ValueError(
                        f"{m.name}: expected 6 columns, got {len(row)}")
                q, a, b, c, d, ans = row
                rows.append({"question": q, "choices": [a, b, c, d],
                             "answer": CHOICES.index(ans.strip())})
            splits[split][subject] = rows
    if not splits["dev"]:
        raise ValueError(f"{tar_path}: no dev-split CSVs found — is this "
                         "the official MMLU data.tar?")

    def rows(split, shots):
        out = []
        for subject in sorted(splits[split]):
            for r in splits[split][subject]:
                prefix = ""
                if shots:
                    header = (
                        "The following are multiple choice questions "
                        "(with answers) about "
                        f"{subject.replace('_', ' ')}.\n\n"
                    )
                    ex = splits["dev"].get(subject, [])[:shots]
                    prefix = header + "".join(
                        format_example(e["question"], e["choices"],
                                       e["answer"]) for e in ex)
                out.append({
                    "subject": subject,
                    "input": prefix + format_example(
                        r["question"], r["choices"], r["answer"],
                        include_answer=False),
                    "output": CHOICES[r["answer"]],
                })
        return out

    written = []
    for split in ("val", "test"):
        for shots, tag in ((0, "zero_shot"), (5, "five_shot")):
            path = os.path.join(out_dir, f"{tag}_mmlu_{split}.json")
            with open(path, "w") as f:
                json.dump(rows(split, shots), f)
            print(f"wrote {path} ({len(json.load(open(path)))} records)")
            written.append(os.path.basename(path))
    with open(os.path.join(out_dir, "CANONICAL"), "w") as f:
        f.write("\n".join(written) + "\n")
    print("stamped CANONICAL — the stand-in warnings are disarmed")


def convert_reference(src, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    with open(src) as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        # the reference's zero-shot file is JSON Lines (one record per
        # line) — same format eval/mmlu.py's loader handles
        data = [json.loads(line) for line in text.splitlines() if line.strip()]
    if isinstance(data, dict):  # columnar
        keys = list(data)
        n = len(data[keys[0]])
        data = [{k: data[k][i] for k in keys} for i in range(n)]
    dst = os.path.join(out_dir, os.path.basename(src))
    with open(dst, "w") as f:
        json.dump(data, f)
    print(f"wrote {dst} ({len(data)} records)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--from_reference", default=None)
    ap.add_argument("--from_hub", action="store_true")
    ap.add_argument("--from_tar", default=None,
                    help="official MMLU data.tar (user-supplied download); "
                         "builds all four canonical splits offline")
    ap.add_argument("--out_dir", default="data/mmlu")
    a = ap.parse_args()
    if a.from_reference:
        convert_reference(a.from_reference, a.out_dir)
    elif a.from_tar:
        build_from_tar(a.from_tar, a.out_dir)
    elif a.from_hub:
        build_from_hub(a.out_dir)
    else:
        ap.error("pass --from_reference PATH, --from_tar PATH, or --from_hub")
