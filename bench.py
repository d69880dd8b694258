"""Round benchmark — prints ONE JSON line for the driver.

Headline metric: effective weight-read bandwidth (GB/s) of the fused NF4
dequant+matmul kernel in the decode regime (M=16, K=N=4096 — a 7B-class
layer).  ``vs_baseline`` = fraction of v5e HBM speed-of-light (819 GB/s),
the BASELINE.json per-kernel north star.

Measurement method: the dispatch path on this box caches identical execute
requests, so each timed call derives its inputs from a fresh scalar counter
and unrolls the kernel n× inside one jit; the (n2−n1) slope isolates device
time from RPC overhead.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


HBM_PEAK_GBPS = 819.0  # TPU v5e


def main():
    from qlora_tpu.ops.bench_kernels import qmm_repeat
    from qlora_tpu.quant import quantize
    from qlora_tpu.quant.blockwise import absmax_f32

    K, N, M = 4096, 4096, 16
    kw = jax.random.PRNGKey(1)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    w_bytes = K * N // 2 + K * N // 64 + 4 * K * N // 64 // 256
    base = jax.random.normal(kw, (M, K), dtype=jnp.float32) * 1e-3

    # repeat-grid: R× the whole matmul inside ONE pallas dispatch; the
    # (R2−R1) slope isolates device time from dispatch/RPC noise, and the
    # fresh counter input defeats any execute-request caching.
    r1, r2 = 8, 72
    ts = {}
    for R in (r1, r2):
        f = jax.jit(
            lambda c, p_, a_, R=R: jnp.sum(
                qmm_repeat(
                    (base * c).astype(jnp.bfloat16), p_, a_,
                    qt.shape, qt.block_size, qt.quant_type, reps=R, tkp_max=2048,
                ).astype(jnp.float32)
            )
        )
        f(jnp.float32(0.5), qt.packed, am).block_until_ready()
        best = float("inf")
        for r in range(8):
            c = jnp.float32(1.0 + r)
            t0 = time.perf_counter()
            f(c, qt.packed, am).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    per_call = max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)
    gbps = w_bytes / per_call / 1e9

    print(json.dumps({
        "metric": "nf4_fused_matmul_weight_read",
        "value": round(gbps, 1),
        "unit": "GB/s",
        "vs_baseline": round(gbps / HBM_PEAK_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
