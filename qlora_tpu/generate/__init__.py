"""Generation engine: batch, streaming, and continuous batching."""

from .sampler import SamplingParams, sample_token, top_k_mask, top_p_mask
from .engine import generate, generate_stream, prefill, decode_loop

__all__ = [
    "SamplingParams", "sample_token", "top_k_mask", "top_p_mask",
    "generate", "generate_stream", "prefill", "decode_loop",
]
