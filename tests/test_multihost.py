"""Multi-host skeleton: 2 CPU processes × 4 virtual devices train one step
with losses identical to the single-process step (VERDICT round-1 item 3;
reference analog: torchrun DDP, /root/reference/qlora.py:300-304)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=4,
)
LCFG = LoraConfig(r=4, alpha=8)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)
    state = init_train_state(lora, opt)
    step = make_train_step(CFG, LCFG, opt, accum_steps=1, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, CFG.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}
    losses, gnorms = [], []
    for i in range(2):
        state, m = step(state, params, batch, jax.random.PRNGKey(50 + i))
        losses.append(float(m["loss"]))
        gnorms.append(float(m["grad_norm"]))
    return losses, gnorms


@pytest.mark.slow
def test_two_process_cpu_pod_matches_single_process(tmp_path):
    # reference FIRST: jax compile pools have wedged for many minutes when
    # the parent compiles after managing subprocesses on this 4-cpu box
    ref_losses, ref_gnorms = _single_process_reference()

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            # never leave orphaned workers spinning in a collective
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker timed out; partial output:\n"
                        f"{out.decode()[-2000:]}")
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            res = json.load(f)
        assert res["process_count"] == 2
        np.testing.assert_allclose(res["losses"], ref_losses, rtol=2e-3)
        np.testing.assert_allclose(res["grad_norms"], ref_gnorms, rtol=5e-3)
    # both processes observed identical global metrics
    with open(tmp_path / "result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "result_1.json") as f:
        r1 = json.load(f)
    assert r0["losses"] == r1["losses"]
