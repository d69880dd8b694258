"""Evaluation subsystems: MMLU rank classification + GPT judge harness."""

from .mmlu import abcd_token_ids, evaluate_mmlu, load_mmlu_file

__all__ = ["abcd_token_ids", "evaluate_mmlu", "load_mmlu_file"]
