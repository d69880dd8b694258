"""Scaling-efficiency benchmark: tokens/s at 1 device vs an N-device mesh.

BASELINE.json's scaling target (≥85% multi-host efficiency) needs the
measurement harness even where the dev box has one chip: this script runs
the sharded dp×fsdp×tp train step at each mesh size available and reports
  tokens_per_s(N) / (N × tokens_per_s(1))
On a CPU host with --xla_force_host_platform_device_count=N it validates
the *mechanics* (collective overlap, batch scaling); on a pod slice the
same script produces the real efficiency number.  Multi-host runs launch
one process per host with --coordinator_address (see
qlora_tpu/parallel/distributed.py) and aggregate via process 0.

Timing: every timed region ends with host materialization of a
data-dependent scalar (np.asarray(loss)) — see docs/DESIGN.md §6 on why
block_until_ready alone cannot be trusted on relay-attached devices.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --steps 5 --seq 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable
_cc_enable(jax)

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # the axon TPU plugin's sitecustomize overrides the env var at import
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.parallel.sharded_step import (
    init_sharded_train_state,
    make_sharded_train_step,
    sharded_param_shardings,
)
from qlora_tpu.train import make_optimizer


def run_mesh(cfg, lcfg, shape, per_device_batch, seq, steps):
    dp, fsdp, tp = shape
    n = dp * fsdp * tp
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(dp, fsdp, tp),
                ("dp", "fsdp", "tp"))
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    params = jax.tree_util.tree_map(
        jax.device_put, params, sharded_param_shardings(params, mesh))
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-4, total_steps=100)
    state = init_sharded_train_state(lora, opt, mesh)
    step = make_sharded_train_step(cfg, lcfg, opt, mesh, params, state,
                                   donate=False)
    B = per_device_batch * dp * fsdp
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, seq), 0,
                             cfg.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}
    # warmup/compile
    state, m = step(state, params, batch, jax.random.PRNGKey(9))
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, params, batch, jax.random.PRNGKey(10 + i))
    np.asarray(m["loss"])  # honest completion barrier
    dt = (time.perf_counter() - t0) / steps
    return {"mesh": f"{dp}x{fsdp}x{tp}", "devices": n,
            "global_batch": B, "seq": seq, "s_per_step": dt,
            "tokens_per_s": B * seq / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--per_device_batch", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    cfg = ModelConfig(
        arch="llama", vocab_size=2048, hidden_size=args.hidden,
        intermediate_size=args.hidden * 2, num_layers=args.layers,
        num_heads=args.hidden // 64, num_kv_heads=args.hidden // 64,
    )
    lcfg = LoraConfig(r=16, alpha=16)
    n = len(jax.devices())
    shapes = [(1, 1, 1)]
    if n >= 2:
        shapes.append((2, 1, 1))
    if n >= 4:
        shapes.append((2, 2, 1))
    if n >= 8:
        shapes.append((2, 2, 2))
        shapes.append((8, 1, 1))

    results = []
    for shape in shapes:
        r = run_mesh(cfg, lcfg, shape, args.per_device_batch, args.seq,
                     args.steps)
        results.append(r)
        print(json.dumps(r))
    base = results[0]["tokens_per_s"]
    for r in results[1:]:
        eff = r["tokens_per_s"] / (r["devices"] * base)
        print(json.dumps({"mesh": r["mesh"],
                          "scaling_efficiency_vs_1dev": round(eff, 3),
                          "target": ">=0.85 on real multi-host ICI/DCN"}))


if __name__ == "__main__":
    main()
