"""GSPMD mesh + partition rules — replaces accelerate device_map / NCCL DDP.

Reference equivalents being replaced (SURVEY.md N12/N13): the multi-GPU
``device_map="auto"`` layer placement (qlora.py:296-304) and torchrun DDP
(qlora.py:300-304).  Here a single ``jax.sharding.Mesh`` with axes
``(dp, fsdp, tp)`` covers both: batch over ``dp``, frozen NF4 weights
tensor-sharded along their output dimension over ``fsdp × tp`` (ICI),
LoRA grads all-reduced by the compiler.

Sharding the packed NF4 arrays along the **output (N)** axis keeps every
constraint trivial: nibble pairs and quant blocks lie along K, so an N-shard
is itself a valid QuantizedTensor.  N/(fsdp·tp) must stay a multiple of 128
(kernel lane tile) — the HF importer pads intermediate dims accordingly.
"""

from .mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    lora_shardings,
    shard_params,
    MeshAxes,
)
from .sharded_step import (
    make_sharded_train_step,
    init_sharded_train_state,
    sharded_param_specs,
    sharded_param_shardings,
)
from .tp_decode import (
    make_tp_forward_fn,
    make_tp_mesh,
    shard_decode_params,
    shard_paged_cache,
    shard_tp_cache,
)

__all__ = [
    "make_mesh", "batch_sharding", "param_shardings", "lora_shardings",
    "shard_params", "MeshAxes",
    "make_sharded_train_step", "init_sharded_train_state",
    "sharded_param_specs", "sharded_param_shardings",
    "make_tp_forward_fn", "make_tp_mesh", "shard_decode_params",
    "shard_paged_cache", "shard_tp_cache",
]
