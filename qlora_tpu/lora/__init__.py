"""LoRA adapters — TPU-native equivalent of peft's LoraConfig/get_peft_model.

Reference semantics (SURVEY.md N7, /root/reference/qlora.py:37-43,379-394):
per linear layer, trainable ``A ∈ R^{K×r}``, ``B ∈ R^{r×N}`` with
``y += (α/r) · dropout(x) @ A @ B``; A init ~ He-uniform, B init zeros;
adapters applied to **all** linear layers of every block
(``find_all_linear_names``, qlora.py:248-259 — lm_head excluded).

LoRA master params are stored f32 (cast to bf16 in the forward): this fixes
the reference's fp16-instability known-issue (README.md:137) at negligible
memory cost since adapters are ~0.1-0.2% of params.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LoraConfig:
    r: int = struct.field(pytree_node=False, default=64)           # qlora.py:177
    alpha: float = struct.field(pytree_node=False, default=16.0)   # qlora.py:180
    dropout: float = struct.field(pytree_node=False, default=0.0)  # 0.1/0.05 in scripts

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora(key: jax.Array, in_dim: int, out_dim: int, r: int) -> dict:
    """One adapter: A ~ He-uniform (kaiming a=√5 over fan_in), B = 0.

    kaiming_uniform(a=√5) bound = gain·√(3/fan_in) with gain = √(2/(1+5))
    = 1/√in_dim — matching peft's torch init exactly."""
    bound = 1.0 / math.sqrt(in_dim)
    a = jax.random.uniform(key, (in_dim, r), jnp.float32, -bound, bound)
    return {"a": a, "b": jnp.zeros((r, out_dim), jnp.float32)}


def apply_lora(
    x: jax.Array,
    adapter: dict,
    scale: float,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """(α/r)·dropout(x) @ A @ B in bf16 compute; x [..., K] → [..., N]."""
    xd = x
    if dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, x.shape)
        xd = jnp.where(keep, x / (1.0 - dropout), 0.0).astype(x.dtype)
    a = adapter["a"].astype(jnp.bfloat16)
    b = adapter["b"].astype(jnp.bfloat16)
    h = jnp.dot(xd.astype(jnp.bfloat16), a, preferred_element_type=jnp.float32)
    y = jnp.dot(h.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
    return (y * scale).astype(jnp.bfloat16)


def merge_lora(w: jax.Array, adapter: dict, scale: float) -> jax.Array:
    """W + α/r·A@B — the peft ``merge_and_unload`` equivalent (demo notebook
    cell 1).  Caller re-quantizes the merged weight if desired."""
    delta = adapter["a"].astype(jnp.float32) @ adapter["b"].astype(jnp.float32)
    return (w.astype(jnp.float32) + scale * delta).astype(w.dtype)


def count_lora_params(lora_tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora_tree))


def merge_lora_into_params(params: dict, lora: dict, lcfg: LoraConfig,
                           requantize: bool = True) -> dict:
    """Model-level merge_and_unload: fold every adapter into its base linear.

    Quantized linears are dequantized, merged, and (optionally) re-quantized
    — the notebook demo's 16-bit ``merge_and_unload()`` path corresponds to
    ``requantize=False``.  Returns a new params tree; inputs are untouched.
    """
    import jax.numpy as jnp

    from qlora_tpu.models.layers import DenseLinear, QLinear
    from qlora_tpu.quant.blockwise import dequantize, quantize

    def merge_linear(lin, adapter):
        # leaves are stacked [L, ...]; merge layer-by-layer
        n_layers = adapter["a"].shape[0]

        def one(lin_l, ad_l):
            if isinstance(lin_l, QLinear):
                w = dequantize(lin_l.qt, jnp.float32)
                merged = merge_lora(w, ad_l, lcfg.scale)
                if requantize:
                    return QLinear(
                        qt=quantize(
                            merged,
                            block_size=lin_l.qt.block_size,
                            quant_type=lin_l.qt.quant_type,
                            double_quant=lin_l.qt.double_quant,
                        ),
                        bias=lin_l.bias,
                    )
                return DenseLinear(w=merged.astype(jnp.bfloat16), bias=lin_l.bias)
            merged = merge_lora(lin_l.w.astype(jnp.float32), ad_l, lcfg.scale)
            return DenseLinear(w=merged.astype(lin_l.w.dtype), bias=lin_l.bias)

        per_layer = [
            one(
                jax.tree_util.tree_map(lambda x: x[i], lin),
                jax.tree_util.tree_map(lambda x: x[i], adapter),
            )
            for i in range(n_layers)
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)

    blocks = dict(params["blocks"])
    for name, adapter in lora.items():
        blocks[name] = merge_linear(params["blocks"][name], adapter)
    return dict(params, blocks=blocks)
