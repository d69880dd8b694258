"""Blockwise 4-bit quantization with double-quantized scales — pure-jnp core.

This is the TPU-native equivalent of bitsandbytes' blockwise k-bit quantization
(`kQuantizeBlockwise`/`kDequantizeBlockwise`), re-designed for a 2-D weight
layout instead of bnb's flat-memory blocks:

* A weight ``W[K, N]`` (used as ``y = x @ W``) is quantized in blocks of
  ``block_size`` (default 64) **along the contraction axis K, per output
  column n**: ``absmax[K//B, n] = max |W[bB:(b+1)B, n]|``.
* 4-bit codes are packed two-per-byte with **global split-half** layout:
  byte ``(r, n)`` holds logical row ``r`` in the low nibble and row
  ``K/2 + r`` in the high nibble.  A packed K-tile therefore decodes with
  two 2-D bit-ops (no element interleave, no 3-D masks — Mosaic-friendly),
  and the fused matmul kernel contracts it against two x-tiles
  (``x[:, kTile]`` and ``x[:, K/2 + kTile]``) reading each packed byte
  exactly once.  Quant blocks lie along K, so sharding along N is
  unconstrained; sharding along K must shard packed rows (each shard pairs
  logical rows ``r``/``K/2+r`` consistently when x is sharded to match —
  see qlora_tpu.parallel for the partition rules).
* Double quantization (QLoRA §3.2, reference call-site qlora.py:324) stores
  the fp32 absmax tensor as int8 with one fp32 scale per meta-block of 256
  scales plus a single fp32 mean offset, saving ~0.37 bits/param.  Unlike
  bnb's flat-memory 256-blocks, meta-blocks here are **column-aligned**
  (along K within each output column) so scale dequant can fuse into the
  matmul kernel and sharding along N never splits a meta-block.

Everything here is shape-static, jit-able, and runs on CPU; the Pallas
kernels in ``qlora_tpu.ops`` consume this storage format and are tested
against these functions as the oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .codebooks import get_code

DEFAULT_BLOCK = 64
ABSMAX_BLOCK = 256  # double-quant block size over the flattened absmax tensor


@struct.dataclass
class QuantizedTensor:
    """A 4-bit blockwise-quantized 2-D tensor (frozen base weight).

    Pytree leaves: ``packed`` and the scale arrays.  Static metadata rides in
    non-pytree fields so the object can flow through jit/scan/shard_map.
    """

    packed: jax.Array          # uint8 [K//2, N] (split-half nibbles) / int8 [K, N]
    absmax: jax.Array          # f32 [K//B, N] (plain) or int8 [K//B, N] (double-quant)
    absmax_scale: Optional[jax.Array]   # f32 [ceil(K//B/256), N] or None
    absmax_offset: Optional[jax.Array]  # f32 scalar (or [k_shards]) or None
    shape: tuple = struct.field(pytree_node=False)          # logical (K, N)
    block_size: int = struct.field(pytree_node=False, default=DEFAULT_BLOCK)
    quant_type: str = struct.field(pytree_node=False, default="nf4")
    # >1 ⇒ rows were quantized/packed per K-chunk (shard-local split-half),
    # enabling row-parallel (K-sharded) use under shard_map: every chunk is
    # a self-contained QuantizedTensor (see quantize_k_sharded)
    k_shards: int = struct.field(pytree_node=False, default=1)

    @property
    def double_quant(self) -> bool:
        return self.absmax_scale is not None

    @property
    def nbytes(self) -> int:
        n = self.packed.size + self.absmax.size * self.absmax.dtype.itemsize
        if self.absmax_scale is not None:
            n += self.absmax_scale.size * 4 + 4
        return n


def _encode(w_scaled: jax.Array, code: jax.Array) -> jax.Array:
    """Nearest-codebook-entry index for values already scaled to [-1, 1].

    The codebook is sorted, so use midpoint thresholds (15 comparisons) —
    cheaper and jit-friendlier than an argmin over a 16× expanded tensor,
    and exactly equivalent to nearest-value rounding.
    """
    midpoints = (code[1:] + code[:-1]) * 0.5  # (15,)
    # sum of (w > midpoint_i) over i == index of nearest entry
    idx = jnp.zeros(w_scaled.shape, dtype=jnp.uint8)
    for i in range(midpoints.shape[0]):
        idx = idx + (w_scaled > midpoints[i]).astype(jnp.uint8)
    return idx


def double_quantize_absmax(absmax: jax.Array):
    """Quantize the fp32 absmax tensor ``[R, N]`` to int8 with column-aligned
    meta-blocks of (up to) 256 scales along R, plus a global fp32 mean offset.

    Returns (q_int8 [R, N], scales_f32 [ceil(R/256), N], offset_f32scalar).
    R is zero-padded internally to a multiple of 256; padded entries are
    trimmed on dequant.
    """
    R, N = absmax.shape
    am = absmax.astype(jnp.float32)
    pad = (-R) % ABSMAX_BLOCK
    offset = jnp.mean(am)
    centered = jnp.pad(am - offset, ((0, pad), (0, 0)))
    blocks = centered.reshape(-1, ABSMAX_BLOCK, N)
    scales = jnp.max(jnp.abs(blocks), axis=1)  # [nmb, N]
    safe = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(blocks / safe[:, None, :] * 127.0), -127, 127)
    return q.reshape(-1, N)[:R].astype(jnp.int8), scales, offset


def dequantize_absmax(
    q: jax.Array, scales: jax.Array, offset: jax.Array, out_shape: tuple
) -> jax.Array:
    """Inverse of :func:`double_quantize_absmax` → f32 absmax of `out_shape`.

    `offset` may be a [k_shards] vector (K-sharded tensors: one mean offset
    per chunk); each chunk then dequantizes independently."""
    R, N = out_shape
    if getattr(offset, "ndim", 0) == 1 and offset.shape[0] > 1:
        n = offset.shape[0]
        Rc, Sc = R // n, scales.shape[0] // n
        return jnp.concatenate([
            dequantize_absmax(q[i * Rc:(i + 1) * Rc],
                              scales[i * Sc:(i + 1) * Sc], offset[i], (Rc, N))
            for i in range(n)
        ], axis=0)
    pad = (-R) % ABSMAX_BLOCK
    blocks = jnp.pad(q.astype(jnp.float32), ((0, pad), (0, 0))).reshape(
        -1, ABSMAX_BLOCK, N
    )
    flat = blocks * (scales[:, None, :] / 127.0) + offset
    return flat.reshape(-1, N)[:R]


@partial(jax.jit, static_argnames=("block_size", "quant_type", "double_quant"))
def quantize(
    w: jax.Array,
    block_size: int = DEFAULT_BLOCK,
    quant_type: str = "nf4",
    double_quant: bool = True,
) -> QuantizedTensor:
    """Quantize a 2-D weight ``W[K, N]``.

    quant_type "nf4"/"fp4" → packed 4-bit nibbles (split-half layout);
    quant_type "int8" → blockwise linear int8 (the ``--bits 8`` base-quant
    path, reference qlora.py:314,317 / bnb Linear8bitLt capability): codes
    stored unpacked as int8 [K, N], same per-block absmax + optional double
    quantization of the scales."""
    if w.ndim != 2:
        raise ValueError(f"quantize expects a 2-D weight, got shape {w.shape}")
    K, N = w.shape
    if quant_type == "int8":
        if K % block_size != 0:
            raise ValueError(f"K={K} must be divisible by block_size={block_size}")
        wf = w.astype(jnp.float32)
        blocks = wf.reshape(K // block_size, block_size, N)
        absmax = jnp.max(jnp.abs(blocks), axis=1)
        safe = jnp.where(absmax == 0, 1.0, absmax)
        q = jnp.clip(
            jnp.round(blocks / safe[:, None, :] * 127.0), -127, 127
        ).reshape(K, N).astype(jnp.int8)
        if double_quant:
            aq, sc, off = double_quantize_absmax(absmax)
            return QuantizedTensor(
                packed=q, absmax=aq, absmax_scale=sc, absmax_offset=off,
                shape=(K, N), block_size=block_size, quant_type="int8",
            )
        return QuantizedTensor(
            packed=q, absmax=absmax, absmax_scale=None, absmax_offset=None,
            shape=(K, N), block_size=block_size, quant_type="int8",
        )
    if K % (2 * block_size) != 0:
        # split-half packing pairs rows r and K/2+r; K/2 must cover whole blocks
        raise ValueError(f"K={K} must be divisible by 2*block_size={2 * block_size}")
    code = get_code(quant_type)

    wf = w.astype(jnp.float32)
    blocks = wf.reshape(K // block_size, block_size, N)
    absmax = jnp.max(jnp.abs(blocks), axis=1)  # [K//B, N]
    safe = jnp.where(absmax == 0, 1.0, absmax)
    scaled = (blocks / safe[:, None, :]).reshape(K, N)
    idx = _encode(scaled, code)  # uint8 [K, N], values 0..15

    # global split-half packing: row r low nibble, row K/2 + r high nibble
    half = K // 2
    packed = (idx[:half] | (idx[half:] << 4)).astype(jnp.uint8)

    if double_quant:
        q, sc, off = double_quantize_absmax(absmax)
        return QuantizedTensor(
            packed=packed, absmax=q, absmax_scale=sc, absmax_offset=off,
            shape=(K, N), block_size=block_size, quant_type=quant_type,
        )
    return QuantizedTensor(
        packed=packed, absmax=absmax, absmax_scale=None, absmax_offset=None,
        shape=(K, N), block_size=block_size, quant_type=quant_type,
    )


def logical_k(qt: QuantizedTensor) -> int:
    """Leaf-derived logical contraction dim (4-bit packs 2 rows/byte)."""
    return qt.packed.shape[-2] * (1 if qt.quant_type == "int8" else 2)


def quantize_k_sharded(
    w: jax.Array,
    n_shards: int,
    block_size: int = DEFAULT_BLOCK,
    quant_type: str = "nf4",
    double_quant: bool = True,
) -> QuantizedTensor:
    """Quantize ``W[K, N]`` with SHARD-LOCAL split-half packing over
    ``n_shards`` K-chunks — the storage for row-parallel (Megatron) linears:
    shard chunk i over a mesh axis (packed/absmax/absmax_scale rows split
    evenly, absmax_offset entry i), and each device's slice is a
    self-contained QuantizedTensor (see :func:`local_chunk`)."""
    K, N = w.shape
    if K % n_shards != 0:
        raise ValueError(f"K={K} not divisible by n_shards={n_shards}")
    Kc = K // n_shards
    parts = [
        quantize(w[i * Kc:(i + 1) * Kc], block_size, quant_type, double_quant)
        for i in range(n_shards)
    ]
    cat = lambda xs: jnp.concatenate(xs, axis=0)
    return QuantizedTensor(
        packed=cat([p.packed for p in parts]),
        absmax=cat([p.absmax for p in parts]),
        absmax_scale=(cat([p.absmax_scale for p in parts])
                      if double_quant else None),
        absmax_offset=(jnp.stack([p.absmax_offset for p in parts])
                       if double_quant else None),
        shape=(K, N), block_size=block_size, quant_type=quant_type,
        k_shards=n_shards,
    )


def local_chunk(qt: QuantizedTensor) -> QuantizedTensor:
    """Re-tag a per-device slice of a K-sharded tensor as self-contained
    (k_shards=1) so the fused kernels apply directly.  Call inside
    shard_map after the leaves have been sharded down to one chunk
    (dims re-derive from the local leaves)."""
    return QuantizedTensor(
        packed=qt.packed, absmax=qt.absmax, absmax_scale=qt.absmax_scale,
        absmax_offset=qt.absmax_offset,
        shape=(logical_k(qt), qt.packed.shape[-1]),
        block_size=qt.block_size, quant_type=qt.quant_type, k_shards=1,
    )


def absmax_f32(qt: QuantizedTensor) -> jax.Array:
    """The per-block absmax as f32 [K//B, N], undoing double quant if present.

    Dims come from the leaves (not `shape` metadata) so per-device shards
    under shard_map dequantize correctly."""
    K, N = logical_k(qt), qt.packed.shape[-1]
    target = (K // qt.block_size, N)
    if qt.double_quant:
        return dequantize_absmax(qt.absmax, qt.absmax_scale, qt.absmax_offset, target)
    return qt.absmax.astype(jnp.float32)


def unpack_indices(packed: jax.Array, block_size: int = DEFAULT_BLOCK,
                   k_shards: int = 1) -> jax.Array:
    """uint8 [K//2, N] → uint8 code indices [K, N] (split-half layout;
    per-chunk pairing when k_shards > 1)."""
    del block_size  # layout no longer depends on it; kept for API stability
    low = packed & jnp.uint8(0x0F)
    high = packed >> 4
    if k_shards > 1:
        K2 = packed.shape[0]
        Rc = K2 // k_shards
        return jnp.concatenate([
            jnp.concatenate([low[i * Rc:(i + 1) * Rc],
                             high[i * Rc:(i + 1) * Rc]], axis=0)
            for i in range(k_shards)
        ], axis=0)
    return jnp.concatenate([low, high], axis=0)


@partial(jax.jit, static_argnames=("dtype",))
def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the weight ``W[K, N]`` in `dtype` (pure-jnp reference path).

    Leaf-derived dims (shard_map-safe)."""
    K, N = logical_k(qt), qt.packed.shape[-1]
    am = absmax_f32(qt)                 # [K//B, N]
    if qt.quant_type == "int8":
        vals = qt.packed.astype(jnp.float32) * (1.0 / 127.0)
    else:
        code = get_code(qt.quant_type)
        idx = unpack_indices(qt.packed, qt.block_size, qt.k_shards)
        vals = code[idx.astype(jnp.int32)]  # f32 [K, N]
    w = vals.reshape(K // qt.block_size, qt.block_size, N) * am[:, None, :]
    return w.reshape(K, N).astype(dtype)
