"""Evaluation subsystems: MMLU rank classification + GPT judge harness."""

from .mmlu import abcd_token_ids, evaluate_mmlu, load_mmlu_file
from .judge import run_judge, gen_prompt, parse_score_pair, parse_three_class_score
from .baseline import generate_baseline_answers

__all__ = [
    "abcd_token_ids", "evaluate_mmlu", "load_mmlu_file",
    "run_judge", "gen_prompt", "parse_score_pair", "parse_three_class_score",
    "generate_baseline_answers",
]
