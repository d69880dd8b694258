"""shard_map training step — manual dp×fsdp×tp parallelism with Pallas kernels.

GSPMD (jit + NamedSharding) partitions the *xla-impl* dequant graph
automatically, but a pallas_call is opaque to the partitioner.  This module
runs the WHOLE train step under ``shard_map`` so the fused NF4 kernels apply
directly to each device's weight shard, with explicit collectives
(replacing the reference's accelerate placement + torchrun DDP,
/root/reference/qlora.py:296-330):

* tp axis   — every linear is column-parallel (N-sharded); inputs get
  Megatron's identity-fwd/psum-bwd, outputs all-gather-fwd/slice-bwd
  (the conjugate pair keeps gradients exact — see models.layers).
* fsdp axis — frozen NF4 storage is further split over fsdp and
  all-gathered just-in-time per layer (ZeRO-3 for base weights; the packed
  4-bit format makes the gather ~4.25 bits/param).  fsdp also acts as a
  second batch axis, and optimizer state is sharded over it (ZeRO-1 — the
  TPU-native replacement for the reference's paged optimizer,
  qlora.py:198 / SURVEY.md N5).
* dp axis   — batch sharded; grads psum'd over (dp, fsdp) once per step.

Gradient math (exact vs the single-device step): each microbatch computes
the LOCAL token-loss SUM; grads of that sum are scaled by 1/(global token
count) per microbatch, accumulated over a lax.scan, and psum'd over the
data axes exactly once.  No collective appears inside the differentiated
loss function, so no transpose-rule inflation is possible.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import DenseLinear, QLinear, tp_shard_context
from qlora_tpu.quant.blockwise import QuantizedTensor
from qlora_tpu.train.loss import masked_cross_entropy
from qlora_tpu.train.step import TrainState

# shard_map storage order: N split by tp (major) then fsdp (minor), so the
# per-layer fsdp all-gather reassembles each tp rank's contiguous columns
SHARD_MODEL_AXES = ("tp", "fsdp")
DATA_AXES = ("dp", "fsdp")


def sharded_param_specs(params: dict) -> dict:
    """PartitionSpecs for shard_map in_specs: linears + embed + lm_head
    N-sharded over (tp, fsdp); norms replicated."""

    def qt_spec(qt: QuantizedTensor, stacked: bool):
        lead = (None,) if stacked else ()
        return QuantizedTensor(
            packed=P(*lead, None, SHARD_MODEL_AXES),
            absmax=P(*lead, None, SHARD_MODEL_AXES),
            absmax_scale=(None if qt.absmax_scale is None
                          else P(*lead, None, SHARD_MODEL_AXES)),
            absmax_offset=None if qt.absmax_offset is None else P(),
            shape=qt.shape, block_size=qt.block_size, quant_type=qt.quant_type,
        )

    def lin_spec(lin, stacked=True):
        lead = (None,) if stacked else ()
        if isinstance(lin, QLinear):
            return QLinear(
                qt=qt_spec(lin.qt, stacked),
                bias=None if lin.bias is None else P(*lead, SHARD_MODEL_AXES),
            )
        return DenseLinear(
            w=P(*lead, None, SHARD_MODEL_AXES),
            bias=None if lin.bias is None else P(*lead, SHARD_MODEL_AXES),
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
        "embed": P(None, SHARD_MODEL_AXES),   # feature-sharded lookup + gather
        "blocks": blocks,
        "final_norm": {k: P() for k in params["final_norm"]},
        "lm_head": lin_spec(params["lm_head"], stacked=False),
    }


def sharded_param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding tree for device_put-ing frozen params ahead of the step."""
    specs = sharded_param_specs(params)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        specs, is_leaf=lambda x: isinstance(x, P),
    )


def replicated_like(tree) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


# ---------------------------------------------------------------------------
# ZeRO-1: flat-padded slicing of the trainable tree over fsdp
# ---------------------------------------------------------------------------

# chunk granularity; multiple of the 8-bit optimizer's state block (256) so
# per-rank shards align to quant-block boundaries
_CHUNK_ALIGN = 256


def _chunk_of(size: int, n_shards: int) -> int:
    return math.ceil(size / (n_shards * _CHUNK_ALIGN)) * _CHUNK_ALIGN


def _flat_pad(x: jax.Array, n_shards: int) -> jax.Array:
    """Leaf → 1-D, zero-padded to n_shards × chunk."""
    chunk = _chunk_of(x.size, n_shards)
    flat = x.reshape(-1)
    return jnp.pad(flat, (0, n_shards * chunk - flat.shape[0]))


def _slice_leaf(x: jax.Array, n_shards: int, rank) -> jax.Array:
    chunk = _chunk_of(x.size, n_shards)
    return jax.lax.dynamic_slice_in_dim(
        _flat_pad(x, n_shards), rank * chunk, chunk, axis=0
    )


def _slice_tree(tree, n_shards: int, rank):
    return jax.tree_util.tree_map(lambda x: _slice_leaf(x, n_shards, rank), tree)


def _unslice_tree(sliced, like_tree, axis_name: str):
    """All-gather per-leaf fsdp shards back to the shapes of `like_tree`."""
    def one(s, like):
        full = jax.lax.all_gather(s, axis_name, axis=0, tiled=True)
        return full[: like.size].reshape(like.shape).astype(like.dtype)
    return jax.tree_util.tree_map(one, sliced, like_tree)


def init_zero1_opt_state(trainable, optimizer, n_shards: int):
    """Optimizer state over the flat-padded trainable tree: the global view
    of every leaf is [n_shards × chunk]; device view under P('fsdp') is one
    chunk.  Works for any elementwise optax transform (adamw, adam8bit —
    chunks align to the 8-bit state's 256-blocks)."""
    flatpad = jax.tree_util.tree_map(
        lambda p: _flat_pad(p.astype(jnp.float32), n_shards), trainable
    )
    return optimizer.init(flatpad)


def zero1_state_specs(opt_state_example) -> Any:
    """P('fsdp') for array leaves, P() for scalars (counts)."""
    return jax.tree_util.tree_map(
        lambda x: P("fsdp") if getattr(x, "ndim", 0) >= 1 else P(),
        opt_state_example,
    )


def opt_state_zero1_to_full(opt_state, trainable, optimizer):
    """Flat-padded ZeRO-1 optimizer state → the single-device layout
    (for portable checkpoints)."""
    full_t = jax.eval_shape(optimizer.init, trainable)

    def one(x, t):
        if getattr(t, "ndim", 0) == 0 or tuple(x.shape) == tuple(t.shape):
            return x
        size = math.prod(t.shape) if t.shape else 1
        return x.reshape(-1)[:size].reshape(t.shape).astype(t.dtype)

    return jax.tree_util.tree_map(one, opt_state, full_t)


def opt_state_full_to_zero1(opt_state, trainable, optimizer, n_shards: int):
    """Single-device optimizer state → flat-padded ZeRO-1 layout (resume a
    single-device checkpoint onto an fsdp mesh).  Chunk alignment (256)
    keeps 8-bit state blocks bit-identical across the conversion."""
    z_t = jax.eval_shape(
        lambda tr: init_zero1_opt_state(tr, optimizer, n_shards), trainable
    )

    def one(x, t):
        if getattr(t, "ndim", 0) == 0 or tuple(x.shape) == tuple(t.shape):
            return x
        flat = x.reshape(-1)
        return jnp.pad(flat, (0, t.shape[0] - flat.shape[0])).astype(t.dtype)

    return jax.tree_util.tree_map(one, opt_state, z_t)


def init_sharded_train_state(
    trainable, optimizer, mesh: Mesh, zero1: bool = True
) -> TrainState:
    """TrainState whose optimizer state is fsdp-sharded (when fsdp > 1)."""
    F = mesh.shape.get("fsdp", 1)
    if zero1 and F > 1:
        opt_state = init_zero1_opt_state(trainable, optimizer, F)
        specs = zero1_state_specs(opt_state)
        opt_state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            opt_state, specs,
        )
    else:
        opt_state = optimizer.init(trainable)
    return TrainState(
        step=jnp.zeros([], jnp.int32), trainable=trainable, opt_state=opt_state
    )


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------


def make_sharded_train_step(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    frozen_example: dict,
    state_example: TrainState,
    accum_steps: int = 1,
    clip_norm: Optional[float] = 0.3,
    donate: bool = True,
    remat: str = "save_linear",   # see transformer._remat_wrap
):
    """Returns train_step(state, frozen, batch, rng) under shard_map.

    mesh must carry axes ("dp", "fsdp", "tp") (any size, incl. 1).  Batch
    leaves are [accum, B, S] when accum_steps > 1 (B sharded over dp×fsdp).
    When fsdp > 1 the state must come from :func:`init_sharded_train_state`
    (ZeRO-1: optimizer update runs on this rank's flat chunk of the grads,
    updates are all-gathered).  `clip_norm` replicates the optax chain's
    clip_by_global_norm against the TRUE global grad norm before slicing, so
    the in-chain shard-local clip becomes a no-op.
    """
    from qlora_tpu.models.transformer import forward

    for ax in ("dp", "fsdp", "tp"):
        if ax not in mesh.shape:
            raise ValueError(f"mesh must have axis {ax!r}; has {mesh.axis_names}")
    F = mesh.shape["fsdp"]
    zero1 = F > 1

    frozen_specs = sharded_param_specs(frozen_example)
    opt_specs = (zero1_state_specs(state_example.opt_state) if zero1
                 else replicated_like(state_example.opt_state))
    state_specs = TrainState(
        step=P(), trainable=replicated_like(state_example.trainable),
        opt_state=opt_specs,
    )
    if accum_steps == 1:
        bspec = P(DATA_AXES)
    else:
        bspec = P(None, DATA_AXES)
    batch_specs = {"input_ids": bspec, "attention_mask": bspec, "labels": bspec}

    def local_step(state, frozen, batch, rng):
        def loss_sum_fn(trainable, mb, r):
            with tp_shard_context("tp", "fsdp"):
                logits, _ = forward(
                    frozen, trainable, mb["input_ids"], cfg, lcfg,
                    attn_mask=mb["attention_mask"], rng=r, remat=remat,
                )
            loss, n = masked_cross_entropy(logits[:, :-1], mb["labels"][:, 1:])
            return loss * n, n  # LOCAL token-loss sum — no collectives in here

        grad_fn = jax.value_and_grad(loss_sum_fn, has_aux=True)

        def micro(trainable, mb, r):
            (lsum, n), g = grad_fn(trainable, mb, r)
            n_glob = jax.lax.psum(n, DATA_AXES)           # scalar — cheap
            denom = jnp.maximum(n_glob, 1).astype(jnp.float32)
            # local contribution to the grad of this microbatch's GLOBAL mean
            g = jax.tree_util.tree_map(lambda t: t / denom, g)
            return g, jax.lax.psum(lsum, DATA_AXES), n_glob

        if accum_steps == 1:
            g_local, lsum_g, n_g = micro(state.trainable, batch, rng)
            loss = lsum_g / jnp.maximum(n_g, 1)
        else:
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                gsum, ls, ns = carry
                mb, r = xs
                g, lsum_g, n_g = micro(state.trainable, mb, r)
                return (jax.tree_util.tree_map(jnp.add, gsum, g),
                        ls + lsum_g, ns + n_g), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable
            )
            (g_local, ls, ns), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.int32(0)), (batch, rngs)
            )
            g_local = jax.tree_util.tree_map(
                lambda g: g / accum_steps, g_local
            )
            loss = ls / jnp.maximum(ns, 1)

        # the ONE heavy collective: sum partial grads over the data axes
        grads = jax.lax.psum(g_local, DATA_AXES)
        gnorm = optax.global_norm(grads)

        if zero1:
            if clip_norm is not None:
                # optax.clip_by_global_norm semantics on the TRUE norm
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
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.trainable
            )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, frozen_specs, batch_specs, P()),
        out_specs=(state_specs, {"loss": P(), "grad_norm": P()}),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
