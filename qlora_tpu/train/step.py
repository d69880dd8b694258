"""The jit training/eval step: value_and_grad over LoRA params, gradient
accumulation via lax.scan, optax update.

Replaces the reference's transformers.Seq2SeqTrainer inner loop
(SURVEY.md §3.3 / N9): per-microbatch forward (grad-checkpointed blocks),
backward through the fused dequant-matmul into LoRA only, clip 0.3,
AdamW, warmup-then-constant LR.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward
from qlora_tpu.train.loss import masked_cross_entropy


@struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any            # LoRA pytree (or full params in full-finetune)
    opt_state: Any


def loss_fn(trainable, frozen, batch, cfg, lcfg, rng, train, mode="lora",
            remat="full"):
    if mode == "lora":
        params, lora = frozen, trainable
    else:  # full finetune (qlora.py:157-160): the whole model is trainable
        params, lora = trainable, None
    logits, _ = forward(
        params, lora, batch["input_ids"], cfg, lcfg,
        attn_mask=batch.get("attention_mask"),
        rng=rng, remat=remat if train else False,
    )
    # next-token alignment: logits[:, t] predicts labels[:, t+1]
    loss, n = masked_cross_entropy(logits[:, :-1], batch["labels"][:, 1:])
    return loss, n


def make_train_step(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
    donate: bool = True,
    mode: str = "lora",
    remat: "str | bool" = "save_linear",
):
    """Returns train_step(state, frozen_params, batch, rng) -> (state, metrics).

    batch leaves are [accum_steps, micro_bs, S] when accum_steps > 1, else
    [bs, S].  Gradients are averaged over microbatches inside one jit.
    In mode="full" the frozen_params argument is ignored.

    remat: gradient-checkpoint policy (see transformer._remat_wrap) —
    "save_linear" (default for LoRA: keeps the pallas matmul outputs,
    recomputes only elementwise; measured 0.329 → 0.276 s/step at the 7B
    bench shape on v5e, benchmarks/remat_ablation.py) or "full"
    (reference semantics, minimum memory; forced for mode="full" where
    the saved outputs would crowd the full-precision grads).
    """
    if mode == "full" and remat == "save_linear":
        remat = "full"

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_micro(trainable, frozen, mb, rng):
        (loss, n), grads = grad_fn(trainable, frozen, mb, cfg, lcfg, rng,
                                   True, mode, remat)
        return loss, n, grads

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, frozen, batch, rng):
        if accum_steps == 1:
            loss, n, grads = one_micro(state.trainable, frozen, batch, rng)
        else:
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                gsum, losssum, nsum = carry
                mb, r = xs
                loss, n, grads = one_micro(state.trainable, frozen, mb, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (gsum, losssum + loss * n, nsum + n), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable
            )
            (gsum, losssum, nsum), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.int32(0)), (batch, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
            loss = losssum / jnp.maximum(nsum, 1)

        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, trainable=trainable, opt_state=opt_state
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_eval_step(cfg: ModelConfig, lcfg: LoraConfig, mode: str = "lora"):
    @jax.jit
    def eval_step(trainable, frozen, batch):
        loss, n = loss_fn(trainable, frozen, batch, cfg, lcfg,
                          jax.random.PRNGKey(0), False, mode)
        return loss, n

    return eval_step


def init_train_state(trainable, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
    )
