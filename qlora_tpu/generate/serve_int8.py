"""Offline int8 requantization for decode serving.

On v5e the fused NF4 kernel's decode (VPU) work — not the MXU dot — binds
the small-M decode regime (measured: ~40µs decode vs 21.8µs bf16 dot for a
4096² layer).  Serving engines therefore build a per-column int8 copy of
the frozen weights once at startup and decode through the direct int8 MXU
kernel (ops.qmatmul._qmm_pallas_i8_direct): weight reads run at near-HBM
speed-of-light and the dot at the 2× int8 MXU rate.  Cost: 8 bits/param of
extra HBM for the serving copy and ~1.2% relative error on decode logits
(per-channel w8a8, the standard serving trade); prefill and training stay
on the exact NF4 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qlora_tpu.models.layers import DenseLinear, QLinear
from qlora_tpu.quant.blockwise import dequantize, quantize, quantize_k_sharded


def requantize_linear_int8(lin: QLinear, k_shards: int = 1) -> QLinear:
    """Stacked [L, ...] QLinear → per-column int8 QLinear (block_size=K).

    ``k_shards > 1`` quantizes per-column PER K-CHUNK (block_size = K/tp,
    ``QuantizedTensor.k_shards`` set) so row-parallel tensor-parallel
    serving can run each device's chunk through the direct int8 MXU kernel:
    every partial product is dequantized by its own chunk-local column
    scale before the psum, so the reduction is exact over the int8 values.
    """
    n_layers = lin.qt.packed.shape[0]

    def one(lin_l):
        w = dequantize(lin_l.qt, jnp.float32)
        K = w.shape[0]
        if k_shards > 1:
            qt = quantize_k_sharded(w, k_shards, block_size=K // k_shards,
                                    quant_type="int8", double_quant=False)
        else:
            qt = quantize(w, block_size=K, quant_type="int8",
                          double_quant=False)
        return QLinear(qt=qt, bias=lin_l.bias)

    per_layer = [
        one(jax.tree_util.tree_map(lambda x: x[i], lin))
        for i in range(n_layers)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def _int8_lm_head(params: dict):
    """Per-column int8 copy of the (bf16 Dense) lm_head — same recipe as
    the block linears.  The B=1 decode regime otherwise pays the NF4
    small-M kernel's ~0.14×-SOL wall on the single largest weight read of
    the step (D×V: 262 MB bf16 at 7B); per-column int8 halves the bytes
    and runs the direct int8 MXU kernel.  Zero-init vocab-pad columns
    survive (quantize guards absmax==0), and forward() slices logits back
    to vocab_size before softmax."""
    lm = params.get("lm_head")
    if not isinstance(lm, DenseLinear):
        return lm   # already quantized or absent
    w = lm.w.astype(jnp.float32)
    # pad N to a multiple of 1024 (llama's 32000 → 32768): the direct-int8
    # kernel's weight streaming needs wide N-contiguous tiles (TN 1024/2048
    # ≈ 0.92 of HBM SOL vs 128-wide strided rows for an unpadded vocab);
    # pad columns are zero and forward() slices logits back to vocab_size
    # before softmax, so they never receive probability mass
    N = w.shape[1]
    pad = (-N) % 1024
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    qt = quantize(w, block_size=w.shape[0], quant_type="int8",
                  double_quant=False)
    bias = lm.bias
    if bias is not None and pad:
        bias = jnp.pad(bias, ((0, pad),))
    return QLinear(qt=qt, bias=bias)


def requantize_params_int8_unstacked(params: dict) -> dict:
    """Serving copy with ``blocks`` as a PER-LAYER list, built layer by
    layer so the stacked and unstacked int8 trees never coexist (the
    stacked-then-split path peaks ~6.7 GB higher at 7B — enough to OOM a
    16 GB chip next to the NF4 tree and the KV pools).  The list form is
    what forward()'s unrolled decode path consumes (models/unstack.py).
    The lm_head joins the serving copy as per-column int8 too."""
    blocks = params["blocks"]
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]

    def one_linear(lin_l):
        w = dequantize(lin_l.qt, jnp.float32)
        qt = quantize(w, block_size=w.shape[0], quant_type="int8",
                      double_quant=False)
        return QLinear(qt=qt, bias=lin_l.bias)

    out = []
    for i in range(n_layers):
        bl = {}
        for name, v in blocks.items():
            v_i = jax.tree_util.tree_map(lambda a: a[i], v)
            bl[name] = one_linear(v_i) if isinstance(v, QLinear) else v_i
        out.append(bl)
    return dict(params, blocks=out, lm_head=_int8_lm_head(params))


def requantize_params_int8(params: dict, row_parallel_k_shards: int = 1) -> dict:
    """Serving copy of the model params with every QLinear per-column int8.

    Non-QLinear leaves (embed, norms, DenseLinear lm_head) are shared with
    the original tree (no copy).  ``row_parallel_k_shards`` K-chunks the
    megatron row-parallel linears (wo/w_down/w_out) for tp serving."""
    from qlora_tpu.parallel.megatron_step import ROW_PARALLEL

    blocks = {}
    for name, v in params["blocks"].items():
        if isinstance(v, QLinear):
            ks = (row_parallel_k_shards if name in ROW_PARALLEL else 1)
            blocks[name] = requantize_linear_int8(v, ks)
        else:
            blocks[name] = v
    # single-chip serving quantizes the lm_head too; the tp path keeps the
    # sharded bf16 lm_head (PagedBatcher's tp branch consumes only
    # dec["blocks"], so the extra copy is sliced away there)
    lm = _int8_lm_head(params) if row_parallel_k_shards == 1 else params.get(
        "lm_head")
    return dict(params, blocks=blocks, lm_head=lm)
