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
from qlora_tpu.quant.blockwise import dequantize, quantize


def requantize_linear_int8(lin: QLinear) -> QLinear:
    """Stacked [L, ...] QLinear → per-column int8 QLinear (block_size=K)."""
    n_layers = lin.qt.packed.shape[0]

    def one(lin_l):
        w = dequantize(lin_l.qt, jnp.float32)
        K = w.shape[0]
        return QLinear(
            qt=quantize(w, block_size=K, quant_type="int8",
                        double_quant=False),
            bias=lin_l.bias,
        )

    per_layer = [
        one(jax.tree_util.tree_map(lambda x: x[i], lin))
        for i in range(n_layers)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def requantize_params_int8(params: dict) -> dict:
    """Serving copy of the model params with every QLinear per-column int8.

    Non-QLinear leaves (embed, norms, DenseLinear lm_head) are shared with
    the original tree (no copy)."""
    blocks = {}
    for name, v in params["blocks"].items():
        if isinstance(v, QLinear):
            blocks[name] = requantize_linear_int8(v)
        else:
            blocks[name] = v
    return dict(params, blocks=blocks)
