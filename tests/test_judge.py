"""Judge harness tests with a fake chat function (no network)."""

import json

from qlora_tpu.eval.judge import (
    dump_jsonl,
    gen_prompt,
    load_jsonl,
    parse_score_pair,
    parse_three_class_score,
    run_judge,
)

REVIEWERS = [
    {"category": "general", "prompt_id": 1},
    {"category": "coding", "prompt_id": 2},
]
PROMPTS = [
    {"prompt_id": 1, "system_prompt": "You are a judge.",
     "prompt_template": "Q: {question}\nA1: {answer_1}\nA2: {answer_2}\n{rule}",
     "defaults": {"rule": "Pick the best."}},
    {"prompt_id": 2, "system_prompt": "You are a code judge.",
     "prompt_template": "[{question}] 1:{answer_1} 2:{answer_2} {rule}",
     "defaults": {"rule": "Judge code."}},
]


def test_parse_score_pair():
    assert parse_score_pair("7 9\nbecause...") == [7.0, 9.0]
    assert parse_score_pair("7,9\nx") == [7.0, 9.0]
    assert parse_score_pair("garbage") == [-1.0, -1.0]


def test_parse_three_class():
    assert parse_three_class_score("reasoning...\n1") == 1
    assert parse_three_class_score("2") == 2
    assert parse_three_class_score("text\n7") == -1
    assert parse_three_class_score("") == -1


def test_gen_prompt_category_routing():
    sys_p, prompt, rid, pid = gen_prompt(
        REVIEWERS, PROMPTS, "coding", "q?", "a", "b"
    )
    assert pid == 2 and rid == 2
    assert "code judge" in sys_p
    assert "[q?] 1:a 2:b Judge code." == prompt
    # unknown category falls back to the first reviewer
    _, _, rid, pid = gen_prompt(REVIEWERS, PROMPTS, "nope", "q", "a", "b")
    assert pid == 1 and rid == 1


def test_run_judge_end_to_end(tmp_path):
    questions = [
        {"question_id": 1, "category": "general", "text": "Why sky blue?"},
        {"question_id": 2, "category": "coding", "text": "Write fizzbuzz"},
    ]
    ans1 = [{"question_id": 1, "text": "Rayleigh."},
            {"question_id": 2, "text": "def f(): ..."}]
    ans2 = [{"question_id": 1, "text": "Magic."},
            {"question_id": 2, "text": "print(1)"}]

    def fake_chat(sys_p, user_p, max_tokens):
        return "analysis\n1"

    res = run_judge(questions, ans1, ans2, REVIEWERS, PROMPTS, fake_chat,
                    mode="threeclass", max_workers=2)
    assert len(res) == 2
    assert all(r["score"] == 1 for r in res)
    assert {r["question_id"] for r in res} == {1, 2}

    out = tmp_path / "ratings.jsonl"
    dump_jsonl(res, str(out))
    assert load_jsonl(str(out)) == res


def test_retry_on_failure_slowpath():
    calls = []

    def flaky(sys_p, user_p, max_tokens):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("rate limit")
        return "ok\n2"

    from qlora_tpu.eval.judge import get_eval
    out = get_eval(flaky, "s", "u", 10, max_retry=5)
    assert out == "ok\n2" and len(calls) == 3
