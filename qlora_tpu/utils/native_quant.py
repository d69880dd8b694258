"""ctypes binding for the native NF4 quantizer (native/nf4pack.cpp).

Compiled on demand with g++ (cached in native/build/); falls back to the
pure-jnp quantizer when the toolchain is unavailable, so nothing hard-
depends on it.  Used by the HF importer for fast host-side checkpoint
conversion of large models.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "nf4pack.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libnf4pack.so")

_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    src_mtime = os.path.getmtime(_SRC)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", _SRC, "-o", _SO,
        ]
        logger.info("building native quantizer: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.nf4_quantize.restype = ctypes.c_int
    lib.nf4_quantize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.nf4_double_quant_absmax.restype = ctypes.c_int
    lib.nf4_double_quant_absmax.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception as e:
            logger.warning("native quantizer unavailable (%s); jnp fallback", e)
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def quantize_native(
    w: np.ndarray,
    block_size: int = 64,
    quant_type: str = "nf4",
    double_quant: bool = True,
    n_threads: int = 0,
):
    """Quantize a [K, N] f32 numpy array → QuantizedTensor (host memory)."""
    import jax.numpy as jnp

    from qlora_tpu.quant.blockwise import QuantizedTensor

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native quantizer not built")
    w = np.ascontiguousarray(w, dtype=np.float32)
    K, N = w.shape
    packed = np.empty((K // 2, N), np.uint8)
    absmax = np.empty((K // block_size, N), np.float32)
    rc = lib.nf4_quantize(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        K, N, block_size, 1 if quant_type == "fp4" else 0,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        absmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise ValueError(f"nf4_quantize failed rc={rc} (K={K} N={N})")

    if not double_quant:
        return QuantizedTensor(
            packed=jnp.asarray(packed), absmax=jnp.asarray(absmax),
            absmax_scale=None, absmax_offset=None,
            shape=(K, N), block_size=block_size, quant_type=quant_type,
        )

    R = K // block_size
    q = np.empty((R, N), np.int8)
    scales = np.empty(((R + 255) // 256, N), np.float32)
    offset = ctypes.c_float()
    lib.nf4_double_quant_absmax(
        absmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), R, N,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(offset),
    )
    return QuantizedTensor(
        packed=jnp.asarray(packed), absmax=jnp.asarray(q),
        absmax_scale=jnp.asarray(scales),
        absmax_offset=jnp.float32(offset.value),
        shape=(K, N), block_size=block_size, quant_type=quant_type,
    )
