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

# When set (inside shard_map), every linear's weight is an N-shard over this
# mesh axis: compute the local column block, then all-gather the outputs.
# Activations stay replicated across the axis (column-parallel TP).
_TP_AXIS: list = [None]


@contextlib.contextmanager
def tp_shard_context(axis_name: str):
    """Enable column-parallel tensor parallelism for apply_linear calls."""
    _TP_AXIS.append(axis_name)
    try:
        yield
    finally:
        _TP_AXIS.pop()


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


def apply_linear(lin: Linear, x: jax.Array) -> jax.Array:
    """y = x @ W (+ bias); x [..., K] → [..., N] in bf16."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _TP_AXIS[-1] is not None:
        x2 = _ident_fwd_psum_bwd(x2, _TP_AXIS[-1])
    if isinstance(lin, QLinear):
        y = qmatmul(x2, lin.qt)
    else:
        y = jnp.dot(
            x2.astype(jnp.bfloat16), lin.w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    if lin.bias is not None:
        y = (y.astype(jnp.float32) + lin.bias.astype(jnp.float32)).astype(jnp.bfloat16)
    if _TP_AXIS[-1] is not None:
        y = jax.lax.all_gather(y, _TP_AXIS[-1], axis=1, tiled=True)
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
    """Softmax attention with GQA support; fp32 softmax. Returns [B, S, H, hd]."""
    B, S, H, hd = q.shape
    KVH = k.shape[2]
    if KVH != H:
        rep = H // KVH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qf = q.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    logits = jnp.einsum("bshd,bthd->bhst", qf, k.astype(jnp.float32))
    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(jnp.bfloat16), v)
    return out.astype(jnp.bfloat16)


def causal_mask(S: int, T: int, q_offset: jax.Array | int = 0) -> jax.Array:
    """[1, 1, S, T] causal mask; q position i attends keys ≤ i + q_offset."""
    qi = jnp.arange(S)[:, None] + q_offset
    kj = jnp.arange(T)[None, :]
    return (kj <= qi)[None, None]
