"""End-to-end model benchmark on the current backend (TPU).

Measures, for a ~1B-param LLaMA-architecture model (random NF4 weights):
  * decode throughput (tokens/s) at several batch sizes — continuous-batching
    regime, KV-cached single-token steps;
  * prefill throughput (tokens/s);
  * LoRA train-step time (tokens/s) with remat.

Timing note: on the dev box's axon relay, jax.block_until_ready can resolve
BEFORE device execution finishes; every timed region here therefore ends with
np.asarray(...) of the result (host materialization cannot be faked for
uncached, data-dependent outputs).  Numbers are upper bounds (the first
materialization may include device-side warm-up).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.generate.engine import decode_loop, prefill
from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import forward, init_cache, init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.generate.sampler import SamplingParams
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step


def build(size: str):
    if size == "1b":
        cfg = ModelConfig(
            arch="llama", vocab_size=32000, hidden_size=2048,
            intermediate_size=5632, num_layers=16, num_heads=16, num_kv_heads=16,
        )
    elif size == "3b":
        cfg = ModelConfig(
            arch="llama", vocab_size=32000, hidden_size=3072,
            intermediate_size=8192, num_layers=26, num_heads=24, num_kv_heads=24,
        )
    elif size == "7b":
        cfg = ModelConfig(
            arch="llama", vocab_size=32000, hidden_size=4096,
            intermediate_size=11008, num_layers=32, num_heads=32, num_kv_heads=32,
        )
    else:
        raise ValueError(size)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    params = jax.block_until_ready(params)
    return cfg, params


def bench_decode(cfg, params, B, steps=64, prompt_len=128, max_len=512):
    lcfg = LoraConfig(r=16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, prompt_len), 0,
                             cfg.vocab_size)
    lengths = jnp.full((B,), prompt_len, jnp.int32)
    cache = init_cache(cfg, B, max_len)
    last, cache = prefill(params, None, ids, lengths, cfg, lcfg, cache=cache)
    toks, cache2 = decode_loop(
        params, None, last, cache, jnp.zeros((B, cfg.vocab_size), bool),
        jax.random.PRNGKey(0), cfg=cfg, lcfg=lcfg, sparams=SamplingParams(),
        max_new_tokens=8, eos_id=-1,
    )
    np.asarray(toks)  # force real completion of warmup
    t0 = time.perf_counter()
    toks, cache2 = decode_loop(
        params, None, last + 1e-5, cache, jnp.zeros((B, cfg.vocab_size), bool),
        jax.random.PRNGKey(0), cfg=cfg, lcfg=lcfg, sparams=SamplingParams(),
        max_new_tokens=steps, eos_id=-1,
    )
    np.asarray(toks)  # host materialization = honest completion barrier
    dt = time.perf_counter() - t0
    tps = B * steps / dt
    print(f"decode  B={B:3d}: {dt/steps*1e3:7.2f} ms/step  {tps:8.1f} tok/s",
          flush=True)
    return tps


def bench_prefill(cfg, params, B=4, S=512):
    lcfg = LoraConfig(r=16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    f = jax.jit(lambda p, i: forward(p, None, i, cfg, lcfg)[0])
    np.asarray(f(params, ids))
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        y = f(params, ids + r)  # distinct inputs defeat relay caching
        np.asarray(y[:, -1, :8])
    dt = (time.perf_counter() - t0) / reps
    print(f"prefill B={B} S={S}: {dt*1e3:7.2f} ms  {B*S/dt:9.0f} tok/s", flush=True)


def bench_train(cfg, params, B=8, S=512, steps=8):
    lcfg = LoraConfig(r=16)
    lora = init_lora_params(jax.random.PRNGKey(2), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-4, total_steps=100)
    state = init_train_state(lora, opt)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}
    state, m = step(state, params, batch, jax.random.PRNGKey(0))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        batch2 = dict(batch, input_ids=(ids + i) % cfg.vocab_size)
        state, m = step(state, params, batch2, jax.random.PRNGKey(i))
        float(m["loss"])  # host round-trip per step: honest barrier
    dt = (time.perf_counter() - t0) / steps
    print(f"train   B={B} S={S}: {dt*1e3:7.2f} ms/step  {B*S/dt:9.0f} tok/s",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b")
    ap.add_argument("--decode_batches", default="1,8,32")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    cfg, params = build(args.size)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params) if hasattr(x, "size"))
    print(f"model {args.size}: ~{n/1e9:.2f}B stored elements", flush=True)
    for b in map(int, args.decode_batches.split(",")):
        bench_decode(cfg, params, b)
    bench_prefill(cfg, params)
    bench_train(cfg, params)
