"""Generation engine: batch, streaming, and continuous batching."""

from .sampler import SamplingParams, sample_token, top_k_mask, top_p_mask
from .engine import beam_search, decode_loop, generate, generate_stream, prefill
from .search import contrastive_search, group_beam_search
from .speculative import generate_speculative, generate_stream_speculative

__all__ = [
    "SamplingParams", "sample_token", "top_k_mask", "top_p_mask",
    "generate", "generate_stream", "prefill", "decode_loop", "beam_search",
    "group_beam_search", "contrastive_search", "generate_speculative",
    "generate_stream_speculative",
]


def __getattr__(name):
    # heavier serving engines are lazy (they import the model stack)
    if name == "ContinuousBatcher":
        from .continuous import ContinuousBatcher
        return ContinuousBatcher
    if name in ("PagedBatcher", "PagedPool"):
        from . import paged
        return getattr(paged, name)
    raise AttributeError(name)
