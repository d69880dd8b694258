"""Back-compat dp×tp entry point — now a wrapper over sharded_step.

Round 1's standalone dp×tp implementation computed wrong gradients: it
psum'd the (already replicated) loss over dp INSIDE the differentiated
function and used a raw all_gather on linear outputs, whose psum_scatter
transpose under check_rep=False re-sums redundant cotangent copies (grad
inflation measured 40-2700× per leaf).  The generalized
:mod:`qlora_tpu.parallel.sharded_step` fixes both: no collectives inside
the loss function, and the Megatron conjugate collective pair
(ident-fwd/psum-bwd on inputs, gather-fwd/slice-bwd on outputs).
"""

from __future__ import annotations

import numpy as np
import optax
from jax.sharding import Mesh

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.parallel.sharded_step import (  # noqa: F401  (re-exports)
    make_sharded_train_step,
    sharded_param_specs,
    sharded_param_shardings,
)
from qlora_tpu.train.step import TrainState


def tp_param_specs(params: dict) -> dict:
    """Kept for API compatibility: specs with the fsdp axis at size 1."""
    return sharded_param_specs(params)


def make_tp_train_step(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    frozen_example: dict,
    state_example: TrainState,
    accum_steps: int = 1,
):
    """dp×tp step: inserts a size-1 fsdp axis and delegates to
    make_sharded_train_step."""
    if set(mesh.axis_names) == {"dp", "fsdp", "tp"}:
        full = mesh
    else:
        dp, tp = mesh.shape["dp"], mesh.shape["tp"]
        full = Mesh(
            np.asarray(mesh.devices).reshape(dp, 1, tp), ("dp", "fsdp", "tp")
        )
    return make_sharded_train_step(
        cfg, lcfg, optimizer, full, frozen_example, state_example,
        accum_steps=accum_steps, donate=False,
    )
