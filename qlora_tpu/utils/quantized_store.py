"""On-disk format for quantized model trees: npz leaves + config json.

Complements hf_import (quantize-on-load): convert once with
scripts/convert_checkpoint.py, then reload in seconds.  The tree structure
(QLinear/DenseLinear/QuantizedTensor nesting) is reconstructed from a
skeleton built out of the stored config, so only array leaves live on disk.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from qlora_tpu.models.config import ModelConfig
from qlora_tpu.utils.checkpoint import load_pytree, save_pytree

FORMAT_VERSION = 1


def save_quantized(path: str, params: dict, cfg: ModelConfig) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(cfg),
        "quantized": _is_quantized(params),
    }
    with open(os.path.join(path, "qlora_tpu_config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    save_pytree(os.path.join(path, "model.npz"), params)


def _is_quantized(params: dict) -> bool:
    from qlora_tpu.models.layers import QLinear

    blocks = params["blocks"]
    return any(isinstance(v, QLinear) for v in blocks.values())


def load_quantized(path: str):
    """Returns (params, cfg). Requires the dir written by save_quantized."""
    from qlora_tpu.models import init_params

    with open(os.path.join(path, "qlora_tpu_config.json")) as f:
        meta = json.load(f)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported format version {meta['format_version']}")
    cfg = ModelConfig(**meta["config"])
    # skeleton with matching tree structure (cheap: abstract eval would be
    # nicer, but init is fast relative to disk IO and keeps one code path)
    skeleton = jax.eval_shape(
        lambda: init_params(jax.random.PRNGKey(0), cfg, quantized=meta["quantized"])
    )
    skeleton = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), skeleton
    )
    params = load_pytree(os.path.join(path, "model.npz"), skeleton)
    params = jax.tree_util.tree_map(jax.numpy.asarray, params)
    return params, cfg
