"""Megatron-style dp×tp training step — 2 psums per block, not 7 gathers.

The "gather" tp style (sharded_step) column-shards EVERY linear and
all-gathers each output: simple and shape-agnostic, but it pays one
all-gather per linear forward and one psum per linear backward.  This
module implements the classic Megatron block instead:

* wq/wk/wv (and w_gate/w_up, w_qkv/w_fc) are column-parallel with NO
  collective — attention runs on each device's LOCAL heads;
* wo (and w_down/w_out) are row-parallel over K-sharded storage
  (quant.blockwise.quantize_k_sharded: shard-local split-half packing) —
  one psum reduces base + LoRA partials together;
* the conjugate custom-vjp pair keeps gradients exact: ident-fwd/psum-bwd
  once per sub-block input, psum-fwd/ident-bwd once per sub-block output.

LoRA adapters shard WITH their base linear (B column-sharded for column
linears, A row-sharded for row linears), so optimizer state shards too —
tensor-parallel trainable state, saved/restored as global arrays.

Scope: LoRA mode, adamw-family optimizers, dp×tp mesh (compose fsdp via
sharded_step when memory, not collective count, is the binder).
Reference analog being replaced: accelerate device_map placement
(/root/reference/qlora.py:296-304) — which ran layers SERIALLY across
GPUs; this runs them in parallel with Megatron comms.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import DenseLinear, QLinear, tp_shard_context
from qlora_tpu.models.transformer import linear_dims
from qlora_tpu.quant.blockwise import (
    QuantizedTensor,
    dequantize,
    quantize_k_sharded,
)
from qlora_tpu.train.loss import masked_cross_entropy
from qlora_tpu.train.step import TrainState

# row-parallel (K-sharded) linears per architecture; everything else is
# column-parallel
ROW_PARALLEL = {"wo", "w_down", "w_out"}


def requantize_row_parallel(params: dict, tp: int) -> dict:
    """Re-pack the row-parallel linears with shard-local split-half packing
    (one dequant+requant pass over wo/w_down/w_out at setup)."""
    blocks = dict(params["blocks"])
    for name in list(blocks):
        lin = blocks[name]
        if name not in ROW_PARALLEL or not isinstance(lin, QLinear):
            continue
        L = lin.qt.packed.shape[0]

        def one(lin_l):
            w = dequantize(lin_l.qt, jnp.float32)
            return QLinear(
                qt=quantize_k_sharded(
                    w, tp, lin_l.qt.block_size, lin_l.qt.quant_type,
                    lin_l.qt.double_quant,
                ),
                bias=lin_l.bias,
            )

        per_layer = [
            one(jax.tree_util.tree_map(lambda x: x[i], lin)) for i in range(L)
        ]
        blocks[name] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_layer
        )
    return dict(params, blocks=blocks)


def _qt_spec(qt: QuantizedTensor, row: bool) -> QuantizedTensor:
    if row:
        return QuantizedTensor(
            packed=P(None, "tp", None), absmax=P(None, "tp", None),
            absmax_scale=(None if qt.absmax_scale is None
                          else P(None, "tp", None)),
            absmax_offset=(None if qt.absmax_offset is None else P(None, "tp")),
            shape=qt.shape, block_size=qt.block_size,
            quant_type=qt.quant_type, k_shards=qt.k_shards,
        )
    return QuantizedTensor(
        packed=P(None, None, "tp"), absmax=P(None, None, "tp"),
        absmax_scale=(None if qt.absmax_scale is None
                      else P(None, None, "tp")),
        absmax_offset=None if qt.absmax_offset is None else P(),
        shape=qt.shape, block_size=qt.block_size,
        quant_type=qt.quant_type, k_shards=qt.k_shards,
    )


def megatron_param_specs(params: dict) -> dict:
    blocks = {}
    for name, v in params["blocks"].items():
        if isinstance(v, QLinear):
            row = name in ROW_PARALLEL
            blocks[name] = QLinear(
                qt=_qt_spec(v.qt, row),
                bias=None if v.bias is None else (
                    P() if row else P(None, "tp")),
            )
        elif isinstance(v, DenseLinear):
            row = name in ROW_PARALLEL
            blocks[name] = DenseLinear(
                w=P(None, "tp", None) if row else P(None, None, "tp"),
                bias=None if v.bias is None else (
                    P() if row else P(None, "tp")),
            )
        elif isinstance(v, dict):
            blocks[name] = {k: P() for k in v}
        else:
            blocks[name] = P()
    return {
        "embed": P(None, "tp"),
        "blocks": blocks,
        "final_norm": {k: P() for k in params["final_norm"]},
        "lm_head": DenseLinear(
            w=P(None, "tp"),
            bias=None if params["lm_head"].bias is None else P("tp"),
        ),
    }


def megatron_lora_specs(lora: dict) -> dict:
    """B column-sharded for column linears; A row-sharded for row linears."""
    out = {}
    for name, ad in lora.items():
        if name in ROW_PARALLEL:
            out[name] = {"a": P(None, "tp", None), "b": P()}
        else:
            out[name] = {"a": P(), "b": P(None, None, "tp")}
    return out


def _opt_specs_like(opt_example, trainable, trainable_specs):
    """Specs for the optimizer state: any leaf whose key-path SUFFIX and
    shape match a trainable leaf inherits its spec (adam mu/nu embed the
    param tree); everything else (counts) is replicated.  adamw-family
    only — blockwise-quantized optimizer state does not follow shards."""
    t_flat = jax.tree_util.tree_flatten_with_path(trainable)[0]
    s_flat = jax.tree_util.tree_flatten(trainable_specs)[0]
    table = [
        (tuple(str(k) for k in path), leaf.shape, spec)
        for (path, leaf), spec in zip(t_flat, s_flat)
    ]

    def one(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return P()
        s = tuple(str(k) for k in path)
        for t_path, t_shape, spec in table:
            if (len(s) >= len(t_path) and s[-len(t_path):] == t_path
                    and tuple(leaf.shape) == tuple(t_shape)):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(one, opt_example)


def init_megatron_state(lora, optimizer, mesh: Mesh, params=None):
    """Shard the (full) LoRA tree per the megatron specs and init the
    optimizer on the sharded arrays (state inherits shardings)."""
    lora_specs = megatron_lora_specs(lora)
    lora_sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        lora, lora_specs, is_leaf=lambda x: isinstance(x, P),
    )
    opt_state = optimizer.init(lora_sharded)
    return TrainState(step=jnp.zeros([], jnp.int32), trainable=lora_sharded,
                      opt_state=opt_state)


def make_megatron_train_step(
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
    """Returns train_step(state, frozen, batch, rng); mesh axes ("dp","tp").

    frozen params must have row-parallel linears re-packed with
    :func:`requantize_row_parallel`; head counts must divide tp.  Batch
    leaves are [accum, B, S] when accum_steps > 1 (B sharded over dp).
    """
    from qlora_tpu.models.transformer import forward

    for ax in ("dp", "tp"):
        if ax not in mesh.shape:
            raise ValueError(f"mesh must have axis {ax!r}; has {mesh.axis_names}")
    tp = mesh.shape["tp"]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"heads ({cfg.num_heads}/{cfg.num_kv_heads}) must divide tp={tp}")

    frozen_specs = megatron_param_specs(frozen_example)
    lora_specs = megatron_lora_specs(state_example.trainable)
    opt_specs = _opt_specs_like(state_example.opt_state,
                                state_example.trainable, lora_specs)
    state_specs = TrainState(step=P(), trainable=lora_specs,
                             opt_state=opt_specs)
    bspec = P("dp") if accum_steps == 1 else P(None, "dp")
    batch_specs = {"input_ids": bspec, "attention_mask": bspec,
                   "labels": bspec}
    def _mentions_tp(spec: P) -> bool:
        for part in spec:
            if part == "tp" or (isinstance(part, (tuple, list))
                                and "tp" in part):
                return True
        return False

    spec_leaves = jax.tree_util.tree_flatten(
        lora_specs, is_leaf=lambda x: isinstance(x, P))[0]
    sharded_leaf = [_mentions_tp(s) for s in spec_leaves]

    def local_step(state, frozen, batch, rng):
        def loss_sum_fn(trainable, mb, r):
            with tp_shard_context("tp", None, style="megatron"):
                logits, _ = forward(
                    frozen, trainable, mb["input_ids"], cfg, lcfg,
                    attn_mask=mb["attention_mask"], rng=r, remat=remat,
                )
            loss, n = masked_cross_entropy(
                logits[:, :-1], mb["labels"][:, 1:]
            )
            return loss * n, n  # LOCAL token-loss sum — no collectives inside

        grad_fn = jax.value_and_grad(loss_sum_fn, has_aux=True)

        def micro(trainable, mb, r):
            (lsum, n), g = grad_fn(trainable, mb, r)
            n_glob = jax.lax.psum(n, "dp")               # scalar — cheap
            denom = jnp.maximum(n_glob, 1).astype(jnp.float32)
            g = jax.tree_util.tree_map(lambda t: t / denom, g)
            return g, jax.lax.psum(lsum, "dp"), n_glob

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

        # tp-SHARDED leaves (col-linear B, row-linear A) get device-exact
        # grads from their cotangent slice; the REPLICATED halves (col A,
        # row B) see only this device's partial path and need a tp psum
        g_flat, g_def = jax.tree_util.tree_flatten(g_local)
        g_flat = [
            jax.lax.psum(g, "dp") if is_sh else jax.lax.psum(g, ("dp", "tp"))
            for g, is_sh in zip(g_flat, sharded_leaf)
        ]
        grads = jax.tree_util.tree_unflatten(g_def, g_flat)

        # global grad norm: tp-sharded leaves contribute psum'd square sums
        g_leaves = jax.tree_util.tree_leaves(grads)
        sq = jnp.float32(0)
        for g, is_sh in zip(g_leaves, sharded_leaf):
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            sq = sq + (jax.lax.psum(s, "tp") if is_sh else s)
        gnorm = jnp.sqrt(sq)
        if clip_norm is not None:
            # exact optax clip semantics on the TRUE norm; the optimizer
            # chain's shard-local clip then becomes a no-op
            grads = jax.tree_util.tree_map(
                lambda g: g * (clip_norm / jnp.maximum(gnorm, clip_norm)),
                grads,
            )
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
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
