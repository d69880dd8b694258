"""Training-step tests: loss decreases, grads flow only to LoRA, 8-bit opt."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import forward, get_config, init_lora_params, init_params
from qlora_tpu.train import (
    IGNORE_INDEX,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    masked_cross_entropy,
)


def test_masked_ce_ignores_ignore_index():
    logits = jnp.zeros((1, 4, 8), jnp.float32)
    labels = jnp.array([[1, IGNORE_INDEX, 2, IGNORE_INDEX]])
    loss, n = masked_cross_entropy(logits, labels)
    assert int(n) == 2
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


def test_masked_ce_all_ignored_is_finite():
    logits = jnp.zeros((1, 3, 8), jnp.float32)
    labels = jnp.full((1, 3), IGNORE_INDEX)
    loss, n = masked_cross_entropy(logits, labels)
    assert int(n) == 0 and np.isfinite(float(loss))


def _toy_batch(key, cfg, bs=4, S=16):
    ids = jax.random.randint(key, (bs, S), 0, cfg.vocab_size)
    return {
        "input_ids": ids,
        "attention_mask": jnp.ones((bs, S), jnp.int32),
        "labels": ids,  # memorize the sequence
    }


@pytest.mark.parametrize("opt_name", ["paged_adamw_32bit", "adam8bit"])
def test_loss_decreases_lora_only(opt_name):
    cfg = get_config("debug")
    lcfg = LoraConfig(r=8, alpha=16)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer(opt_name, 5e-3, total_steps=30)
    state = init_train_state(lora, opt)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)
    batch = _toy_batch(jax.random.PRNGKey(2), cfg)

    losses = []
    for i in range(10):
        state, metrics = step(state, params, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.98, losses
    assert all(np.isfinite(losses))


def test_grad_accumulation_equivalence():
    # accum over 2 identical microbatches == single batch of same data
    cfg = get_config("debug")
    lcfg = LoraConfig(r=4, alpha=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)
    mb = _toy_batch(jax.random.PRNGKey(2), cfg, bs=2, S=8)

    s1 = init_train_state(lora, opt)
    step1 = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)
    s1, m1 = step1(s1, params, mb, jax.random.PRNGKey(9))

    s2 = init_train_state(lora, opt)
    step2 = make_train_step(cfg, lcfg, opt, accum_steps=2, donate=False)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), mb)
    s2, m2 = step2(s2, params, stacked, jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.trainable),
        jax.tree_util.tree_leaves(s2.trainable),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_runs():
    cfg = get_config("debug-neox")
    lcfg = LoraConfig(r=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    ev = make_eval_step(cfg, lcfg)
    loss, n = ev(lora, params, _toy_batch(jax.random.PRNGKey(2), cfg, bs=2, S=8))
    assert np.isfinite(float(loss)) and int(n) > 0


def test_frozen_params_unchanged_by_training():
    cfg = get_config("debug")
    lcfg = LoraConfig(r=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-2, total_steps=5)
    state = init_train_state(lora, opt)
    step = make_train_step(cfg, lcfg, opt, donate=False)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    state, _ = step(state, params, _toy_batch(jax.random.PRNGKey(2), cfg), jax.random.PRNGKey(0))
    after = jax.tree_util.tree_map(np.asarray, params)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_warmup_constant_schedule():
    from qlora_tpu.train import warmup_constant_schedule
    s = warmup_constant_schedule(2e-4, total_steps=100, warmup_ratio=0.03)
    assert float(s(0)) < 2e-4
    np.testing.assert_allclose(float(s(3)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(99)), 2e-4, rtol=1e-6)
