"""Selective-remat ablation at the 7B bench shape (run on the TPU chip).

Compares finetune step time under remat="full" (save only layer
boundaries — the backward re-runs every NF4 pallas matmul) vs
remat="save_linear" (named-residual policy keeping the MXU-heavy outputs;
models/transformer._remat_wrap).  Same shape and slope method as
bench.py's finetune_step_time_7b_1k_tokens.

  python benchmarks/remat_ablation.py [full save_linear]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)
import jax.numpy as jnp

MXU_BF16_TFLOPS = 197.0


def measure(remat):
    from qlora_tpu.lora import LoraConfig
    from qlora_tpu.models import init_lora_params, init_params
    from qlora_tpu.models.config import ModelConfig
    from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
    )
    lcfg = LoraConfig(r=64, alpha=16)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    S = 512
    lora_t = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 2e-4, total_steps=100)
    state = init_train_state(lora_t, opt)
    step_fn = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False,
                              remat=remat)
    ids = jnp.ones((2, S), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    @jax.jit
    def f_step(params, state, batch, seed, R):
        def cond(c):
            return c[0] < R

        def body(c):
            i, st, acc = c
            st2, m = step_fn(st, params, batch,
                             jax.random.fold_in(jax.random.PRNGKey(0),
                                                i + seed))
            return (i + 1, st2, acc + m["loss"])

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), state, jnp.float32(0.0)))
        return acc

    float(f_step(params, state, batch, jnp.int32(1), jnp.int32(1)))  # compile
    ts = {}
    for R in (1, 3):
        best = float("inf")
        for t in range(3):
            t0 = time.perf_counter()
            float(f_step(params, state, batch, jnp.int32(2 + t), jnp.int32(R)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    t_step = max((ts[3] - ts[1]) / 2, 1e-9)
    p_lin = (cfg.hidden_size * cfg.hidden_size *
             (2 + 2 * cfg.num_kv_heads / cfg.num_heads) +
             3 * cfg.hidden_size * cfg.intermediate_size) * cfg.num_layers
    sol = 6 * ids.size * p_lin / (MXU_BF16_TFLOPS * 1e12)
    print(f"remat={remat}: {t_step:.3f} s/step  vs_baseline={sol/t_step:.3f}",
          flush=True)
    del state, lora_t, step_fn, f_step, params
    jax.clear_caches()
    return t_step


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    modes = sys.argv[1:] or ["full", "save_linear"]
    for m in modes:
        measure(m)


if __name__ == "__main__":
    main()
