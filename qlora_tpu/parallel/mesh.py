"""Device mesh construction and parameter partition rules."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qlora_tpu.models.layers import DenseLinear, QLinear
from qlora_tpu.quant.blockwise import QuantizedTensor


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    dp: int = 1
    fsdp: int = 1
    tp: int = 1


def make_mesh(axes: MeshAxes, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = axes.dp * axes.fsdp * axes.tp
    if n > len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(axes.dp, axes.fsdp, axes.tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over dp (leaves fsdp/tp for the model)."""
    return NamedSharding(mesh, P("dp", None))


MODEL_AXES = ("fsdp", "tp")  # frozen weights shard over the product


def _qt_spec(qt: QuantizedTensor, stacked: bool) -> QuantizedTensor:
    """PartitionSpecs for a QuantizedTensor's leaves (N-axis sharding).

    packed [.., K2, N], absmax [.., K/B, N], absmax_scale [.., nmb, N]:
    all shard their last (output) axis over fsdp×tp.  Mirrors the actual
    tensor's None fields so tree structures match.
    """
    lead = (None,) if stacked else ()
    return QuantizedTensor(
        packed=P(*lead, None, MODEL_AXES),
        absmax=P(*lead, None, MODEL_AXES),
        absmax_scale=None if qt.absmax_scale is None else P(*lead, None, MODEL_AXES),
        absmax_offset=None if qt.absmax_offset is None else P(),
        shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
    )


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding tree matching the model param pytree from init_params."""

    def lin_spec(lin, stacked=True):
        lead = (None,) if stacked else ()
        if isinstance(lin, QLinear):
            return QLinear(
                qt=_qt_spec(lin.qt, stacked),
                bias=None if lin.bias is None else P(*lead, MODEL_AXES),
            )
        return DenseLinear(
            w=P(*lead, None, MODEL_AXES),
            bias=None if lin.bias is None else P(*lead, MODEL_AXES),
        )

    def block_specs(blocks: dict) -> dict:
        out = {}
        for name, v in blocks.items():
            if isinstance(v, (QLinear, DenseLinear)):
                out[name] = lin_spec(v)
            elif isinstance(v, dict):  # norm {scale, bias}
                out[name] = {k: P(None, None) for k in v}
            else:  # norm scale array [L, D]
                out[name] = P(None, None)
        return out

    spec = {
        "embed": P(None, MODEL_AXES),
        "blocks": block_specs(params["blocks"]),
        "final_norm": {k: P(None) for k in params["final_norm"]},
        "lm_head": DenseLinear(
            w=P(None, MODEL_AXES),
            bias=None if params["lm_head"].bias is None else P(MODEL_AXES),
        ),
    }
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )


def lora_shardings(lora: dict, mesh: Mesh) -> dict:
    """LoRA adapters are tiny: replicate (grads psum'd by the compiler)."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), lora)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put the param tree onto the mesh with the partition rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
