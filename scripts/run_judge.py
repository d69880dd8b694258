"""CLI wrapper for the GPT judge harness — eval_gpt_review.py equivalent.

Usage (same jsonl formats as the reference's eval/ directory):
  python scripts/run_judge.py \
      --questions eval/prompts/vicuna_questions.jsonl \
      --answers1 generations_a.jsonl --answers2 generations_b.jsonl \
      --reviewers eval/prompts/reviewer.jsonl \
      --prompts eval/prompts/vicuna_prompt_threeclass.jsonl \
      --mode threeclass --output ratings.jsonl \
      --api openai --judge-model gpt-4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qlora_tpu.eval.judge import dump_jsonl, load_jsonl, run_judge


def make_openai_chat(model: str):
    import openai  # optional dep; any OpenAI-compatible endpoint works

    client = openai.OpenAI()

    def chat(system_prompt: str, user_prompt: str, max_tokens: int) -> str:
        resp = client.chat.completions.create(
            model=model,
            messages=[
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_prompt},
            ],
            temperature=0.2,           # eval_gpt_review.py:37
            max_tokens=max_tokens,
        )
        return resp.choices[0].message.content

    return chat


def main():
    # bundled Vicuna banks (eval/prompts/) make a judge run turnkey: only
    # the two answer files are required
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    banks = os.path.join(root, "eval", "prompts")
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions",
                    default=os.path.join(banks, "vicuna_questions.jsonl"))
    ap.add_argument("--answers1", required=True)
    ap.add_argument("--answers2", required=True)
    ap.add_argument("--reviewers",
                    default=os.path.join(banks, "reviewer.jsonl"))
    ap.add_argument("--prompts",
                    default=os.path.join(banks, "vicuna_prompt_threeclass.jsonl"))
    ap.add_argument("--mode", choices=["threeclass", "relative"],
                    default="threeclass")
    ap.add_argument("--output", required=True)
    ap.add_argument("--api", default="openai")
    ap.add_argument("--judge-model", default="gpt-4")
    ap.add_argument("--max-tokens", type=int, default=1024)
    ap.add_argument("--max-workers", type=int, default=8)
    args = ap.parse_args()

    chat_fn = make_openai_chat(args.judge_model)
    results = run_judge(
        load_jsonl(args.questions),
        load_jsonl(args.answers1),
        load_jsonl(args.answers2),
        load_jsonl(args.reviewers),
        load_jsonl(args.prompts),
        chat_fn,
        mode=args.mode,
        max_tokens=args.max_tokens,
        max_workers=args.max_workers,
    )
    dump_jsonl(results, args.output)
    print(f"wrote {len(results)} reviews to {args.output}")


if __name__ == "__main__":
    main()
