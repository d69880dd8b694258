"""Metrics logger + full-finetune training mode tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import get_config, init_params
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step
from qlora_tpu.utils.metrics import MetricsLogger, StepTimer


def test_metrics_logger_jsonl(tmp_path):
    out = str(tmp_path)
    ml = MetricsLogger(out, report_to="none")
    ml.log({"loss": 1.5}, step=1)
    ml.log({"loss": 1.2}, step=2)
    ml.close()
    rows = [json.loads(l) for l in open(f"{out}/train_log.jsonl")]
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[1]["loss"] == 1.2 and "ts" in rows[0]


def test_step_timer_skips_warmup():
    t = StepTimer(skip_first=2)
    import time
    for _ in range(4):
        t.tick(); time.sleep(0.01); t.tock()
    assert len(t.times) == 2 and t.mean > 0


def test_full_finetune_loss_decreases():
    # --full_finetune path (qlora.py:157-160): dense trainable base, no LoRA
    cfg = get_config("debug")
    lcfg = LoraConfig(r=4)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=False)
    opt = make_optimizer("adamw", 1e-3, total_steps=20)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False, mode="full")
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids), "labels": ids}
    losses = []
    for i in range(8):
        state, m = step(state, None, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
