"""Sequence-parallel (context-parallel) training step — dp×sp shard_map.

Long-context training beyond the reference (SURVEY.md §5: the reference's
only sequence levers are grad checkpointing + 4-bit weights).  The sequence
dim is sharded over the ``sp`` mesh axis; every per-token op (embedding,
linears, norms, loss) runs on the local shard, and attention runs through
:mod:`qlora_tpu.ops.ring_attention` — KV shards rotate around the ring via
``ppermute`` (ICI point-to-point) while each device accumulates
online-softmax partials for its query shard.  Per-device activation memory
scales as S/sp, so context length scales linearly with the ring size.

Gradient math mirrors sharded_step: local token-loss sums, one psum of the
grad tree over (dp, sp) per step.  The ring's ppermute transposes to the
inverse rotation under AD, so gradients are exact (tested against the
single-device step).

Restrictions: full-length sequences (no right-padding mask — pack long
contexts), LoRA mode, weights replicated (compose fsdp/tp via
sharded_step for the memory-bound regimes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.train.loss import IGNORE_INDEX, masked_cross_entropy
from qlora_tpu.train.step import TrainState
from qlora_tpu.parallel.sharded_step import replicated_like

SP_DATA_AXES = ("dp", "sp")


def make_sp_train_step(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    frozen_example: dict,
    state_example: TrainState,
    clip_norm: Optional[float] = 0.3,
    donate: bool = True,
):
    """Returns train_step(state, frozen, batch, rng) with batch [B, S]:
    B sharded over dp, S sharded over sp.  mesh axes: ("dp", "sp")."""
    from qlora_tpu.models.transformer import forward

    for ax in ("dp", "sp"):
        if ax not in mesh.shape:
            raise ValueError(f"mesh must have axis {ax!r}; has {mesh.axis_names}")

    frozen_specs = replicated_like(frozen_example)
    state_specs = TrainState(
        step=P(), trainable=replicated_like(state_example.trainable),
        opt_state=replicated_like(state_example.opt_state),
    )
    batch_specs = {"input_ids": P("dp", "sp"), "labels_shifted": P("dp", "sp")}

    def local_step(state, frozen, batch, rng):
        def loss_sum_fn(trainable):
            logits, _ = forward(
                frozen, trainable, batch["input_ids"], cfg, lcfg,
                rng=rng, remat=True, sp_axis="sp",
            )
            # labels were shifted GLOBALLY before sharding, so local logits
            # align with local labels — no cross-shard shift needed here
            loss, n = masked_cross_entropy(logits, batch["labels_shifted"])
            return loss * n, n

        (lsum, n), grads = jax.value_and_grad(loss_sum_fn, has_aux=True)(
            state.trainable
        )
        n_glob = jax.lax.psum(n, SP_DATA_AXES)
        denom = jnp.maximum(n_glob, 1).astype(jnp.float32)
        grads = jax.lax.psum(
            jax.tree_util.tree_map(lambda g: g / denom, grads), SP_DATA_AXES
        )
        loss = jax.lax.psum(lsum, SP_DATA_AXES) / denom
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(step=state.step + 1, trainable=trainable,
                       opt_state=opt_state),
            {"loss": loss, "grad_norm": gnorm},
        )

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, frozen_specs, batch_specs, P()),
        out_specs=(state_specs, {"loss": P(), "grad_norm": P()}),
        check_rep=False,
    )
    sharded = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def train_step(state, frozen, batch, rng):
        labels = batch["labels"]
        # global next-token shift BEFORE sequence sharding (a local shift
        # would drop the prediction at every shard boundary)
        shifted = jnp.concatenate(
            [labels[:, 1:],
             jnp.full((labels.shape[0], 1), IGNORE_INDEX, labels.dtype)],
            axis=1,
        )
        return sharded(
            state, frozen,
            {"input_ids": batch["input_ids"], "labels_shifted": shifted}, rng,
        )

    return train_step
