"""Adapter-only checkpoints with optimizer-state resume.

Reference behavior (SURVEY.md §5 checkpoint/resume):
* ``SavePeftModelCallback`` writes ``checkpoint-N/adapter_model/`` and drops
  the full model weights (qlora.py:262-275);
* a ``completed`` sentinel is touched on train end (qlora.py:281-287);
* ``get_last_checkpoint`` scans for the max-step dir (qlora.py:674-686);
* **known gap fixed here**: the reference cannot restore optimizer state
  (README.md:136) — we checkpoint LoRA params *and* optimizer state *and*
  the data-iterator position.

Format: flattened pytree → ``.npz`` (path-keyed), dependency-free and
multi-host friendly (each host saves only addressable shards — single-host
for now).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np

CHECKPOINT_PREFIX = "checkpoint-"
ADAPTER_DIR = "adapter_model"
COMPLETED_SENTINEL = "completed"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


BF16_SUFFIX = "__bf16"


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays as a path-keyed npz.

    bfloat16 leaves are stored as uint16 bit patterns (npz can't serialize
    ml_dtypes) with a key suffix marking the real dtype.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, v in flat:
        a = np.asarray(v)
        key = _path_str(p)
        if a.dtype == jnp_bfloat16():
            arrays[key + BF16_SUFFIX] = a.view(np.uint16)
        else:
            arrays[key] = a
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def jnp_bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by save_pytree back into the structure of `like`."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, v in flat:
        key = _path_str(p)
        if key + BF16_SUFFIX in data:
            arr = data[key + BF16_SUFFIX].view(jnp_bfloat16())
        elif key in data:
            arr = data[key]
        else:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        if hasattr(v, "dtype") and arr.dtype != v.dtype:
            arr = arr.astype(v.dtype)
        leaves.append(arr)
    return treedef.unflatten(leaves)


def save_checkpoint(
    output_dir: str,
    step: int,
    lora: Any,
    opt_state: Any = None,
    meta: Optional[dict] = None,
    data_state: Optional[dict] = None,
) -> str:
    ckpt = os.path.join(output_dir, f"{CHECKPOINT_PREFIX}{step}")
    adapter = os.path.join(ckpt, ADAPTER_DIR)
    os.makedirs(adapter, exist_ok=True)
    save_pytree(os.path.join(adapter, "adapter_weights.npz"), lora)
    if opt_state is not None:
        save_pytree(os.path.join(ckpt, "optimizer_state.npz"), opt_state)
    info = {"step": step}
    if meta:
        info.update(meta)
    if data_state is not None:
        info["data_state"] = data_state
    with open(os.path.join(ckpt, "trainer_state.json"), "w") as f:
        json.dump(info, f, indent=2)
    return ckpt


def load_checkpoint(
    ckpt_dir: str,
    lora_like: Any,
    opt_state_like: Any = None,
):
    """Returns (lora, opt_state | None, trainer_state dict)."""
    adapter = os.path.join(ckpt_dir, ADAPTER_DIR, "adapter_weights.npz")
    lora = load_pytree(adapter, lora_like)
    opt_state = None
    opt_path = os.path.join(ckpt_dir, "optimizer_state.npz")
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = load_pytree(opt_path, opt_state_like)
    state_path = os.path.join(ckpt_dir, "trainer_state.json")
    info = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            info = json.load(f)
    return lora, opt_state, info


def get_last_checkpoint(output_dir: str):
    """(checkpoint_dir | None, is_completed) — qlora.py:674-686 semantics."""
    if not os.path.isdir(output_dir):
        return None, False
    if os.path.exists(os.path.join(output_dir, COMPLETED_SENTINEL)):
        return None, True
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(rf"{CHECKPOINT_PREFIX}(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(output_dir, name), int(m.group(1))
    return best, False


def mark_completed(output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, COMPLETED_SENTINEL), "a"):
        pass
