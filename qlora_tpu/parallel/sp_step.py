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
    accum_steps: int = 1,
    clip_norm: Optional[float] = 0.3,
    donate: bool = True,
):
    """Returns train_step(state, frozen, batch, rng) with batch [B, S]
    (or [accum, B, S] when accum_steps > 1): B sharded over dp, S sharded
    over sp.  mesh axes: ("dp", "sp").  Accumulation mirrors sharded_step:
    per-microbatch grads of the GLOBAL token mean summed in an in-step
    scan, ONE grad psum at the end."""
    from qlora_tpu.models.transformer import forward

    for ax in ("dp", "sp"):
        if ax not in mesh.shape:
            raise ValueError(f"mesh must have axis {ax!r}; has {mesh.axis_names}")

    frozen_specs = replicated_like(frozen_example)
    state_specs = TrainState(
        step=P(), trainable=replicated_like(state_example.trainable),
        opt_state=replicated_like(state_example.opt_state),
    )
    bspec = P("dp", "sp") if accum_steps == 1 else P(None, "dp", "sp")
    batch_specs = {"input_ids": bspec, "labels_shifted": bspec}

    def local_step(state, frozen, batch, rng):
        def loss_sum_fn(trainable, ids, labels, r):
            logits, _ = forward(
                frozen, trainable, ids, cfg, lcfg,
                rng=r, remat=True, sp_axis="sp",
            )
            # labels were shifted GLOBALLY before sharding, so local logits
            # align with local labels — no cross-shard shift needed here
            loss, n = masked_cross_entropy(logits, labels)
            return loss * n, n   # LOCAL token-loss sum — no collectives

        grad_fn = jax.value_and_grad(loss_sum_fn, has_aux=True)

        def micro(trainable, ids, labels, r):
            (lsum, n), g = grad_fn(trainable, ids, labels, r)
            n_glob = jax.lax.psum(n, SP_DATA_AXES)         # scalar — cheap
            denom = jnp.maximum(n_glob, 1).astype(jnp.float32)
            g = jax.tree_util.tree_map(lambda t: t / denom, g)
            return g, jax.lax.psum(lsum, SP_DATA_AXES), n_glob

        if accum_steps == 1:
            g_local, ls, ns = micro(state.trainable, batch["input_ids"],
                                    batch["labels_shifted"], rng)
        else:
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                gsum, ls, ns = carry
                ids, labels, r = xs
                g, lsum_g, n_g = micro(state.trainable, ids, labels, r)
                return (jax.tree_util.tree_map(jnp.add, gsum, g),
                        ls + lsum_g, ns + n_g), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable
            )
            (g_local, ls, ns), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.int32(0)),
                (batch["input_ids"], batch["labels_shifted"], rngs),
            )
            g_local = jax.tree_util.tree_map(
                lambda g: g / accum_steps, g_local
            )
        loss = ls / jnp.maximum(ns, 1).astype(jnp.float32)

        grads = jax.lax.psum(g_local, SP_DATA_AXES)
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
        # would drop the prediction at every shard boundary); works for
        # [B, S] and [accum, B, S] alike (shift along the sequence axis)
        pad_shape = labels.shape[:-1] + (1,)
        shifted = jnp.concatenate(
            [labels[..., 1:],
             jnp.full(pad_shape, IGNORE_INDEX, labels.dtype)],
            axis=-1,
        )
        return sharded(
            state, frozen,
            {"input_ids": batch["input_ids"], "labels_shifted": shifted}, rng,
        )

    return train_step
