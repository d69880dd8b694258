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

Weight sharding composes: when the mesh also carries ("fsdp", "tp") axes,
frozen NF4 storage is N-sharded over tp×fsdp and all-gathered just-in-time
per layer exactly as in :mod:`qlora_tpu.parallel.sharded_step` (ZeRO-3 for
base weights via ``tp_shard_context``), optimizer state is ZeRO-1-sharded
over fsdp, and fsdp doubles as a second batch axis — so the 65B-class
long-context regime gets sequence parallelism AND sharded weights at once.
Gradient psum then runs over (dp, fsdp, sp); tp needs no grad collective
(the conjugate ident/psum + gather/slice pair keeps LoRA grads exact and
replicated across tp, same argument as sharded_step).

Restrictions: full-length sequences (no right-padding mask — pack long
contexts), LoRA mode, gather-style tp only (megatron head-parallel
attention does not compose with the ring).
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
from qlora_tpu.models.layers import tp_shard_context
from qlora_tpu.train.loss import IGNORE_INDEX, masked_cross_entropy
from qlora_tpu.train.step import TrainState
from qlora_tpu.parallel.sharded_step import (
    _slice_tree,
    _unslice_tree,
    replicated_like,
    sharded_param_specs,
    zero1_state_specs,
)

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
    remat: str = "full",   # long-context path: keep min-memory remat by
                           # default; "save_linear" trades HBM for speed
):
    """Returns train_step(state, frozen, batch, rng) with batch [B, S]
    (or [accum, B, S] when accum_steps > 1): B sharded over dp (× fsdp when
    present), S sharded over sp.  mesh axes: ("dp", "sp"), optionally plus
    ("fsdp", "tp") for jit-gathered weight sharding + ZeRO-1 (see module
    docstring).  Accumulation mirrors sharded_step: per-microbatch grads of
    the GLOBAL token mean summed in an in-step scan, ONE grad psum at the
    end."""
    from qlora_tpu.models.transformer import forward

    for ax in ("dp", "sp"):
        if ax not in mesh.shape:
            raise ValueError(f"mesh must have axis {ax!r}; has {mesh.axis_names}")
    F = mesh.shape.get("fsdp", 1)
    T = mesh.shape.get("tp", 1)
    weight_sharded = F > 1 or T > 1
    if weight_sharded and not ("fsdp" in mesh.shape and "tp" in mesh.shape):
        raise ValueError(
            "weight-sharded sp needs BOTH 'fsdp' and 'tp' mesh axes "
            f"(size 1 is fine); has {mesh.axis_names}")
    zero1 = F > 1
    data_axes = tuple(a for a in ("dp", "fsdp", "sp") if a in mesh.shape)
    batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape)

    frozen_specs = (sharded_param_specs(frozen_example) if weight_sharded
                    else replicated_like(frozen_example))
    opt_specs = (zero1_state_specs(state_example.opt_state) if zero1
                 else replicated_like(state_example.opt_state))
    state_specs = TrainState(
        step=P(), trainable=replicated_like(state_example.trainable),
        opt_state=opt_specs,
    )
    bspec = (P(batch_axes, "sp") if accum_steps == 1
             else P(None, batch_axes, "sp"))
    batch_specs = {"input_ids": bspec, "labels_shifted": bspec}

    def local_step(state, frozen, batch, rng):
        def loss_sum_fn(trainable, ids, labels, r):
            with tp_shard_context("tp" if weight_sharded else None,
                                  "fsdp" if weight_sharded else None):
                logits, _ = forward(
                    frozen, trainable, ids, cfg, lcfg,
                    rng=r, remat=remat, sp_axis="sp",
                )
            # labels were shifted GLOBALLY before sharding, so local logits
            # align with local labels — no cross-shard shift needed here
            loss, n = masked_cross_entropy(logits, labels)
            return loss * n, n   # LOCAL token-loss sum — no collectives

        grad_fn = jax.value_and_grad(loss_sum_fn, has_aux=True)

        def micro(trainable, ids, labels, r):
            (lsum, n), g = grad_fn(trainable, ids, labels, r)
            n_glob = jax.lax.psum(n, data_axes)            # scalar — cheap
            denom = jnp.maximum(n_glob, 1).astype(jnp.float32)
            g = jax.tree_util.tree_map(lambda t: t / denom, g)
            return g, jax.lax.psum(lsum, data_axes), n_glob

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

        grads = jax.lax.psum(g_local, data_axes)
        gnorm = optax.global_norm(grads)
        if zero1:
            if clip_norm is not None:
                # optax.clip_by_global_norm semantics on the TRUE norm (the
                # in-chain clip would see only this rank's flat chunk)
                grads = jax.tree_util.tree_map(
                    lambda g: g * (clip_norm / jnp.maximum(gnorm, clip_norm)),
                    grads,
                )
            rank = jax.lax.axis_index("fsdp")
            g_sl = _slice_tree(grads, F, rank)
            p_sl = _slice_tree(state.trainable, F, rank)
            upd_sl, opt_state = optimizer.update(g_sl, state.opt_state, p_sl)
            updates = _unslice_tree(upd_sl, state.trainable, "fsdp")
        else:
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
