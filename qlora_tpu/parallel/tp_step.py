"""shard_map training step — manual dp×tp parallelism with Pallas kernels.

GSPMD (jit + NamedSharding) partitions the *xla-impl* dequant graph
automatically, but a pallas_call is opaque to the partitioner.  This module
runs the WHOLE train step under ``shard_map``: every device executes
per-shard code (where the fused Pallas kernels apply directly to its weight
shard), with explicit collectives:

* tp axis — every linear is column-parallel (N-sharded); outputs all-gather
  over tp inside ``apply_linear`` (see models.layers.tp_shard_context);
* dp axis — batch sharded; loss/grads psum'd over dp (and tp, where the AD
  of the gathers leaves per-shard partials).

LoRA/optimizer state and norms stay replicated (they're tiny); frozen NF4
trees shard their output axis, which the storage format makes free.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import DenseLinear, QLinear, tp_shard_context
from qlora_tpu.quant.blockwise import QuantizedTensor
from qlora_tpu.train.loss import masked_cross_entropy
from qlora_tpu.train.step import TrainState


def tp_param_specs(params: dict) -> dict:
    """PartitionSpecs for shard_map: every linear N-sharded over 'tp'."""

    def qt_spec(qt: QuantizedTensor, stacked: bool):
        lead = (None,) if stacked else ()
        return QuantizedTensor(
            packed=P(*lead, None, "tp"),
            absmax=P(*lead, None, "tp"),
            absmax_scale=None if qt.absmax_scale is None else P(*lead, None, "tp"),
            absmax_offset=None if qt.absmax_offset is None else P(),
            shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
        )

    def lin_spec(lin, stacked=True):
        lead = (None,) if stacked else ()
        if isinstance(lin, QLinear):
            return QLinear(
                qt=qt_spec(lin.qt, stacked),
                bias=None if lin.bias is None else P(*lead, "tp"),
            )
        return DenseLinear(
            w=P(*lead, None, "tp"),
            bias=None if lin.bias is None else P(*lead, "tp"),
        )

    blocks = {}
    for name, v in params["blocks"].items():
        if isinstance(v, (QLinear, DenseLinear)):
            blocks[name] = lin_spec(v)
        elif isinstance(v, dict):
            blocks[name] = {k: P() for k in v}
        else:
            blocks[name] = P()
    return {
        "embed": P(),                     # replicated (lookup needs full D)
        "blocks": blocks,
        "final_norm": {k: P() for k in params["final_norm"]},
        "lm_head": lin_spec(params["lm_head"], stacked=False),
    }


def replicated_like(tree) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def make_tp_train_step(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    frozen_example: dict,
    state_example: TrainState,
):
    """Returns train_step(state, frozen, batch, rng) running under shard_map.

    `frozen_example`/`state_example` supply tree structures for the specs.
    Batch is sharded over 'dp'; callers device_put frozen params with
    matching NamedShardings (parallel.mesh helpers) to avoid resharding.
    """
    from qlora_tpu.models.transformer import forward

    frozen_specs = tp_param_specs(frozen_example)
    state_specs = TrainState(
        step=P(), trainable=replicated_like(state_example.trainable),
        opt_state=replicated_like(state_example.opt_state),
    )
    batch_specs = {"input_ids": P("dp"), "attention_mask": P("dp"),
                   "labels": P("dp")}

    def local_step(state, frozen, batch, rng):
        def loss_fn(trainable):
            with tp_shard_context("tp"):
                logits, _ = forward(
                    frozen, trainable, batch["input_ids"], cfg, lcfg,
                    attn_mask=batch["attention_mask"], rng=rng, remat=True,
                )
            loss, n = masked_cross_entropy(
                logits[:, :-1], batch["labels"][:, 1:]
            )
            # weight local mean by local token count, then combine over dp
            total = jax.lax.psum(loss * n, "dp")
            count = jax.lax.psum(n, "dp")
            return total / jnp.maximum(count, 1), count

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        # grads are exact+replicated already: apply_linear inserts Megatron's
        # identity-fwd/psum-bwd on each sharded matmul input
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, frozen_specs, batch_specs, P()),
        out_specs=(state_specs, {"loss": P(), "grad_norm": P()}),
        check_rep=False,
    )
    return jax.jit(sharded)
