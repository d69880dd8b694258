"""Where does the verify chunk's cost over a plain decode step go?

Measures, at the 32-slot serving shape (int8 decode copy, paged pool):
  step      — one plain decode step (the non-spec engine's unit)
  chunk     — one C=4 verify chunk WITHOUT drafting (fixed inputs)
  chunk+dft — the full spec burst body (in-graph drafting + scatters)

Run on the TPU chip: python benchmarks/spec_chunk_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import forward, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.generate.serve_int8 import requantize_params_int8_unstacked
from qlora_tpu.ops.qmatmul import default_impl


def slope(f, r1, r2, tries=4):
    f(jnp.int32(1), jnp.int32(r1))
    ts = {}
    for R in (r1, r2):
        best = float("inf")
        for t in range(tries):
            t0 = time.perf_counter()
            float(f(jnp.int32(2 + t), jnp.int32(R)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
    )
    lcfg = LoraConfig()
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    dec = requantize_params_int8_unstacked(params)
    del params

    S, C = 32, 4
    ps, pps = 64, 10
    CTX = 512
    L_, KVH, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    n_pages = 1 + S * pps

    def make_cache():
        kp = [jnp.zeros((n_pages, KVH, ps, hd), jnp.bfloat16)
              for _ in range(L_)]
        vp = [jnp.zeros((n_pages, KVH, ps, hd), jnp.bfloat16)
              for _ in range(L_)]
        tables = (1 + jnp.arange(S)[:, None] * pps
                  + jnp.arange(pps)[None, :]).astype(jnp.int32)
        return {"k_pages": kp, "v_pages": vp, "tables": tables,
                "length": jnp.full((S,), CTX, jnp.int32)}

    @jax.jit
    def f_step(dec, seed, R):
        cache0 = make_cache()

        def body(c):
            i, cache, toks, acc = c
            with default_impl("w8a8"):
                logits, cache = forward(dec, None, toks, cfg, lcfg,
                                        cache=cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (i + 1, cache, nxt[:, None] + seed * 0, acc + jnp.sum(nxt))

        _, _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < R, body,
            (jnp.int32(0), cache0, jnp.full((S, 1), 7, jnp.int32) + seed,
             jnp.int32(0)))
        return acc

    @jax.jit
    def f_chunk(dec, seed, R):
        cache0 = make_cache()

        def body(c):
            i, cache, toks, acc = c
            with default_impl("w8a8"):
                logits, cache = forward(dec, None, toks, cfg, lcfg,
                                        cache=cache)
            cache = dict(cache, length=cache["length"] - (C - 1))  # rollback
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (i + 1, cache,
                    jnp.broadcast_to(nxt[:, None], (S, C)) + seed * 0,
                    acc + jnp.sum(nxt))

        _, _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < R, body,
            (jnp.int32(0), cache0, jnp.full((S, C), 7, jnp.int32) + seed,
             jnp.int32(0)))
        return acc

    # full spec burst body via the engine's own jit
    from qlora_tpu.generate.paged import PagedBatcher

    pb = PagedBatcher.__new__(PagedBatcher)
    pb.cfg, pb.lcfg = cfg, lcfg
    pb.decode_impl = "int8"
    pb.spec_draft_len, pb.spec_ngram = C - 1, 2
    pb.steps_per_dispatch = 1
    pb.num_slots = S
    pb._ctx_cap = pps * ps
    pb.sparams = None
    spec_jit = pb._make_spec_jit()

    @jax.jit
    def f_spec(dec, seed, R):
        cache0 = make_cache()
        ctx0 = jnp.ones((S, pps * ps), jnp.int32) * (7 + seed * 0)
        cur0 = jnp.full((S,), CTX + 1, jnp.int32)

        def body(c):
            i, cache, acc = c
            out, tot, cache = spec_jit(dec, None, cache, ctx0, cur0,
                                       jax.random.PRNGKey(0))
            return (i + 1, cache, acc + jnp.sum(tot))

        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < R, body, (jnp.int32(0), cache0, jnp.int32(0)))
        return acc

    t_step = slope(lambda s, R: f_step(dec, s, R), 8, 24)
    print(f"plain step : {t_step * 1e3:7.2f} ms", flush=True)
    t_chunk = slope(lambda s, R: f_chunk(dec, s, R), 8, 24)
    print(f"C=4 chunk  : {t_chunk * 1e3:7.2f} ms ({t_chunk / t_step:.2f}x)",
          flush=True)
    try:
        t_spec = slope(lambda s, R: f_spec(dec, s, R), 8, 24)
        print(f"spec body  : {t_spec * 1e3:7.2f} ms ({t_spec / t_step:.2f}x)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"spec body measurement failed: {e}", flush=True)


if __name__ == "__main__":
    main()
