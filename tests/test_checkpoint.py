"""Checkpoint/resume tests: round-trip, scanner, sentinel, optimizer state."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import get_config, init_lora_params
from qlora_tpu.train import init_train_state, make_optimizer
from qlora_tpu.utils.checkpoint import (
    get_last_checkpoint,
    load_checkpoint,
    load_pytree,
    mark_completed,
    save_checkpoint,
    save_pytree,
)


def _mk_state():
    cfg = get_config("debug")
    lcfg = LoraConfig(r=4)
    lora = init_lora_params(jax.random.PRNGKey(0), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)
    state = init_train_state(lora, opt)
    return lora, opt, state


def test_pytree_roundtrip(tmp_path):
    lora, _, _ = _mk_state()
    p = str(tmp_path / "t.npz")
    save_pytree(p, lora)
    back = load_pytree(p, lora)
    for a, b in zip(jax.tree_util.tree_leaves(lora), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    lora, opt, state = _mk_state()
    out = str(tmp_path / "run")
    save_checkpoint(out, 7, lora, state.opt_state, meta={"lr": 1e-3})
    ckpt, completed = get_last_checkpoint(out)
    assert not completed and ckpt.endswith("checkpoint-7")
    lora2, opt2, info = load_checkpoint(ckpt, lora, state.opt_state)
    assert info["step"] == 7 and info["lr"] == 1e-3
    assert opt2 is not None
    for a, b in zip(jax.tree_util.tree_leaves(lora), jax.tree_util.tree_leaves(lora2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scanner_picks_max_step(tmp_path):
    lora, _, state = _mk_state()
    out = str(tmp_path / "run")
    for s in (5, 20, 10):
        save_checkpoint(out, s, lora)
    ckpt, _ = get_last_checkpoint(out)
    assert ckpt.endswith("checkpoint-20")


def test_completed_sentinel_short_circuits(tmp_path):
    lora, _, _ = _mk_state()
    out = str(tmp_path / "run")
    save_checkpoint(out, 5, lora)
    mark_completed(out)
    ckpt, completed = get_last_checkpoint(out)
    assert completed and ckpt is None


def test_missing_dir():
    ckpt, completed = get_last_checkpoint("/nonexistent/dir")
    assert ckpt is None and not completed
