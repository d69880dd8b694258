"""Transformer building blocks: norms, RoPE, attention, linear dispatch.

Pure functions over param pytrees (no module framework): idiomatic for
jit/scan/shard_map composition.  Dtype policy matches the reference's k-bit
training prep (SURVEY.md N8, qlora.py:377,396-405): norms in fp32, matmul
compute in bf16, frozen base weights NF4.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from qlora_tpu.quant.blockwise import QuantizedTensor
from qlora_tpu.ops import qmatmul


@struct.dataclass
class QLinear:
    """A linear layer whose weight is a frozen NF4 QuantizedTensor."""
    qt: QuantizedTensor
    bias: Optional[jax.Array] = None

    @property
    def in_dim(self):
        return self.qt.shape[0]

    @property
    def out_dim(self):
        return self.qt.shape[1]


@struct.dataclass
class DenseLinear:
    """A plain (bf16/f32) linear layer — the full-finetune path
    (reference keeps 16/32-bit full finetuning behind --full_finetune,
    qlora.py:157-160,305-309)."""
    w: jax.Array
    bias: Optional[jax.Array] = None

    @property
    def in_dim(self):
        return self.w.shape[0]

    @property
    def out_dim(self):
        return self.w.shape[1]


Linear = Union[QLinear, DenseLinear]

# When set (inside shard_map), every linear's weight is an N-shard over these
# mesh axes: tp = column-parallel (compute local column block, all-gather the
# outputs; activations replicated across tp); fsdp = weight-gathered (the
# N-shard is further split over fsdp in storage and all-gathered just-in-time
# per layer — ZeRO-3 for the frozen base weights, recomputed under remat).
# style: "gather" = every linear gathers its outputs (simple, works for any
# shape); "megatron" = head-parallel attention + row-parallel output
# projections — one psum per sub-block instead of an all-gather per linear.
_SHARD_CTX: list = [(None, None, "gather")]


@contextlib.contextmanager
def tp_shard_context(axis_name: Optional[str], fsdp_axis: Optional[str] = None,
                     style: str = "gather"):
    """Enable tensor parallelism (and optional fsdp weight-gathering) for
    apply_linear calls inside shard_map."""
    _SHARD_CTX.append((axis_name, fsdp_axis, style))
    try:
        yield
    finally:
        _SHARD_CTX.pop()


def shard_ctx_axes() -> tuple:
    """The (tp_axis, fsdp_axis, style) currently in effect."""
    return _SHARD_CTX[-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ident_fwd_psum_bwd(x, axis_name):
    """Megatron's `g` operator: identity forward, psum backward.

    Placed on the (replicated) input of each column-parallel matmul so the
    partial input-cotangents from the N-shards are summed over tp, keeping
    every upstream cotangent exact and replicated."""
    return x


def _ifpb_fwd(x, axis_name):
    return x, None


def _ifpb_bwd(axis_name, _, g):
    return (jax.lax.psum(g, axis_name),)


_ident_fwd_psum_bwd.defvjp(_ifpb_fwd, _ifpb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _gather_cols_fwd_slice_bwd(y, axis_name):
    """Megatron's `g` operator: all-gather forward, LOCAL-SLICE backward.

    The conjugate of :func:`_ident_fwd_psum_bwd`.  A raw ``all_gather``
    transposes to ``psum_scatter`` under shard_map (check_rep=False), which
    SUMS the redundant cotangent copies from the replicated downstream region
    — inflating every upstream gradient by the axis size per gathered linear
    (the round-1 dp×tp step's 40-2700× grad blow-up).  Slicing instead keeps
    the exact invariant: cotangents entering a replicated region are the true
    d(loss)/d· on every member of the axis."""
    return jax.lax.all_gather(y, axis_name, axis=1, tiled=True)


def _gcsb_fwd(y, axis_name):
    return jax.lax.all_gather(y, axis_name, axis=1, tiled=True), y.shape[1]


def _gcsb_bwd(axis_name, n_local, g):
    idx = jax.lax.axis_index(axis_name)
    return (jax.lax.dynamic_slice_in_dim(g, idx * n_local, n_local, axis=1),)


_gather_cols_fwd_slice_bwd.defvjp(_gcsb_fwd, _gcsb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_fwd_ident_bwd(y, axis_name):
    """Megatron's row-parallel output reducer: psum forward, IDENTITY
    backward.  The psum'd output is replicated, so every member of the axis
    receives the exact cotangent; the raw psum's transpose (psum again)
    would multiply it by the axis size."""
    return jax.lax.psum(y, axis_name)


def _pfib_fwd(y, axis_name):
    return jax.lax.psum(y, axis_name), None


def _pfib_bwd(axis_name, _, g):
    return (g,)


_psum_fwd_ident_bwd.defvjp(_pfib_fwd, _pfib_bwd)


def lookup_embedding(emb: jax.Array, ids: jax.Array, dtype=jnp.bfloat16):
    """Embedding lookup aware of (tp, fsdp) feature sharding of the table.

    fsdp is a *batch* axis as well as a weight-shard axis, so the table's
    fsdp columns must be weight-gathered BEFORE the lookup (each fsdp rank
    looks up different rows — gathering features after the lookup would mix
    columns of different tokens).  The tp axis replicates the batch, so its
    feature chunks are gathered on the (cheaper) activations after lookup;
    ("tp","fsdp") storage order (fsdp minor) keeps both gathers contiguous."""
    tp_axis, fsdp_axis, _style = _SHARD_CTX[-1]
    if fsdp_axis is not None:
        emb = _gather_last(emb, fsdp_axis)
    x = emb[ids].astype(dtype)
    if tp_axis is not None:
        x = jax.lax.all_gather(x, tp_axis, axis=x.ndim - 1, tiled=True)
    return x


def _gather_last(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)


def _fsdp_gather_linear(lin: Linear, axis_name: str) -> Linear:
    """Reassemble this device's tp column-shard of a linear whose storage is
    further split over the fsdp axis (ZeRO-3 just-in-time weight gather).

    Storage partitions the output axis as ``P(..., ("tp", "fsdp"))`` — fsdp
    minor — so gathering over fsdp yields the contiguous tp shard.  Packed
    nibbles / absmax / meta-scales all shard the same N axis, which the
    column-aligned quant layout makes split-safe at any 128-lane boundary."""
    if isinstance(lin, QLinear):
        qt = lin.qt
        qt = QuantizedTensor(
            packed=_gather_last(qt.packed, axis_name),
            absmax=_gather_last(qt.absmax, axis_name),
            absmax_scale=(None if qt.absmax_scale is None
                          else _gather_last(qt.absmax_scale, axis_name)),
            absmax_offset=qt.absmax_offset,
            shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
        )
        bias = None if lin.bias is None else _gather_last(lin.bias, axis_name)
        return QLinear(qt=qt, bias=bias)
    bias = None if lin.bias is None else _gather_last(lin.bias, axis_name)
    return DenseLinear(w=_gather_last(lin.w, axis_name), bias=bias)


def apply_linear(lin: Linear, x: jax.Array, tp_mode: str = "auto") -> jax.Array:
    """y = x @ W (+ bias); x [..., K] → [..., N] in bf16.

    tp_mode (only meaningful inside a tp shard context):
      "gather"      — column-parallel with psum-bwd input + output gather
                      (the default style; works for any call site)
      "column"      — column-parallel, NO collectives: output stays an
                      N-shard (megatron head-/column-local compute; the
                      caller placed the ident-fwd/psum-bwd op at the
                      sub-block input)
      "row_partial" — row-parallel, NO collectives: input is a K-shard,
                      output is a PARTIAL sum (caller adds LoRA partials
                      then applies _psum_fwd_ident_bwd once)
    """
    tp_axis, fsdp_axis, style = _SHARD_CTX[-1]
    if tp_mode == "auto":
        tp_mode = "gather"
    if fsdp_axis is not None:
        lin = _fsdp_gather_linear(lin, fsdp_axis)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if tp_axis is not None and tp_mode == "gather":
        x2 = _ident_fwd_psum_bwd(x2, tp_axis)
    if isinstance(lin, QLinear):
        qt = lin.qt
        if qt.k_shards > 1 and tp_axis is not None:
            from qlora_tpu.quant.blockwise import local_chunk

            qt = local_chunk(qt)  # this device's self-contained K-chunk
        y = qmatmul(x2, qt)
    else:
        y = jnp.dot(
            x2.astype(jnp.bfloat16), lin.w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    if lin.bias is not None:
        bias = lin.bias.astype(jnp.float32)
        if tp_axis is not None and tp_mode == "row_partial":
            # partials get psum'd by the caller: pre-divide so the reduced
            # output carries the bias exactly once
            bias = bias / jax.lax.psum(1.0, tp_axis)
        y = (y.astype(jnp.float32) + bias).astype(jnp.bfloat16)
    if tp_axis is not None and tp_mode == "gather":
        y = _gather_cols_fwd_slice_bwd(y, tp_axis)
    return y.reshape(*lead, y.shape[-1])


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """LLaMA RMSNorm; computed in fp32 (qlora.py:400-401 keeps norms fp32)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """GPT-NeoX LayerNorm in fp32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def rope_frequencies(head_dim: int, rotary_dim: int, theta: float, positions: jax.Array):
    """cos/sin tables for the given positions [..., S] → [..., S, rotary_dim/2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, rd/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int):
    """Rotate the first `rotary_dim` features of x [..., S, H, hd].

    Uses the half-split convention (x1 = first half, x2 = second half of the
    rotary dims) matching LLaMA/GPT-NeoX implementations.
    """
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = rot[..., :half], rot[..., half:]
    c = cos[..., None, :]  # broadcast over heads: [..., S, 1, rd/2]
    s = sin[..., None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = xf1 * c - xf2 * s
    r2 = xf2 * c + xf1 * s
    out = jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


def attention(
    q: jax.Array,          # [B, S, H, hd]
    k: jax.Array,          # [B, T, KVH, hd]
    v: jax.Array,          # [B, T, KVH, hd]
    mask: jax.Array,       # [B, 1, S, T] bool (True = attend)
) -> jax.Array:
    """Softmax attention, GQA-grouped; fp32 softmax. Returns [B, S, H, hd].

    GQA queries are GROUPED against their kv head — no ``jnp.repeat``: the
    repeat materializes H/KVH KV copies through HBM and pushes the logits
    einsum onto the VPU as an f32 multiply-reduce, profiled at ~58 ms of a
    107 ms 7B B=32 decode step (docs/DESIGN.md §6c).  Grouped bf16
    operands with f32 accumulation keep both einsums on the MXU and read
    the KV once; bf16×bf16 products are exact in f32, so only the
    accumulation order differs from the previous f32 einsum."""
    B, S, H, hd = q.shape
    KVH = k.shape[2]
    G = H // KVH
    qg = q.reshape(B, S, KVH, G, hd).astype(jnp.bfloat16)
    logits = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(1.0 / hd ** 0.5)
    logits = jnp.where(mask[:, :, None], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", probs.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, S, H, hd).astype(jnp.bfloat16)


def attention_kvmajor(
    q: jax.Array,          # [B, S, H, hd]
    k_buf: jax.Array,      # [B, KVH, T, hd] — the contiguous-cache layout
    v_buf: jax.Array,
    mask: jax.Array,       # [B, 1, S, T] bool (True = attend)
) -> jax.Array:
    """:func:`attention` over a KV-HEAD-MAJOR buffer (the decode cache's
    [B, KVH, T, hd] layout — no transpose materialized).  Used by the
    cache-prefill path; single-token decode goes through the fused Pallas
    kernel instead (ops/decode_attention.py)."""
    B, S, H, hd = q.shape
    KVH = k_buf.shape[1]
    G = H // KVH
    # bf16 operands keep both einsums on the MXU; the CPU backend cannot
    # execute this contraction order in bf16 (DotThunk BF16xBF16=F32
    # unimplemented), so tests/interpret runs compute in f32
    cdt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    qg = q.reshape(B, S, KVH, G, hd).astype(cdt)
    logits = jnp.einsum("bskgd,bktd->bkgst", qg, k_buf.astype(cdt),
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(1.0 / hd ** 0.5)
    logits = jnp.where(mask[:, :, None], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgst,bktd->bskgd", probs.astype(cdt),
                     v_buf.astype(cdt),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, S, H, hd).astype(jnp.bfloat16)


def causal_mask(S: int, T: int, q_offset: jax.Array | int = 0) -> jax.Array:
    """[1, 1, S, T] causal mask; q position i attends keys ≤ i + q_offset."""
    qi = jnp.arange(S)[:, None] + q_offset
    kj = jnp.arange(T)[None, :]
    return (kj <= qi)[None, None]
