"""4-bit blockwise quantization: NF4/FP4 codebooks, double quantization.

TPU-native re-implementation of the capabilities qlora gets from
bitsandbytes (reference call-sites: /root/reference/qlora.py:318-326).
"""

from .codebooks import NF4_CODE, FP4_CODE, get_code, derive_nf4_codebook
from .blockwise import (
    QuantizedTensor,
    quantize,
    dequantize,
    absmax_f32,
    unpack_indices,
    double_quantize_absmax,
    dequantize_absmax,
    quantize_k_sharded,
    local_chunk,
    logical_k,
    DEFAULT_BLOCK,
    ABSMAX_BLOCK,
)

__all__ = [
    "NF4_CODE", "FP4_CODE", "get_code", "derive_nf4_codebook",
    "QuantizedTensor", "quantize", "dequantize", "absmax_f32",
    "unpack_indices", "double_quantize_absmax", "dequantize_absmax",
    "quantize_k_sharded", "local_chunk", "logical_k",
    "DEFAULT_BLOCK", "ABSMAX_BLOCK",
]
