"""Utilities: checkpointing, HF import, tokenizer, metrics logging."""

from .checkpoint import (
    get_last_checkpoint,
    load_checkpoint,
    load_pytree,
    mark_completed,
    save_checkpoint,
    save_pytree,
)
from .hf_import import load_hf_model, read_hf_config
from .tokenizer import Tokenizer, load_tokenizer, resize_embeddings_mean_init

__all__ = [
    "get_last_checkpoint", "load_checkpoint", "load_pytree", "mark_completed",
    "save_checkpoint", "save_pytree",
    "load_hf_model", "read_hf_config",
    "Tokenizer", "load_tokenizer", "resize_embeddings_mean_init",
]
