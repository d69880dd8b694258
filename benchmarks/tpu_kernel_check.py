"""On-TPU smoke + microbenchmark for the fused dequant-matmul kernel.

Run directly on the TPU machine (uses the default backend, i.e. the axon
TPU chip):  python scripts/tpu_kernel_check.py [--bench]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.quant import quantize, dequantize
from qlora_tpu.ops import qmatmul
from qlora_tpu.ops.qmatmul import _qmm_bwd_pallas, _qmm_pallas
from qlora_tpu.quant.blockwise import absmax_f32


def check_correctness():
    for (M, K, N) in [(32, 256, 128), (128, 1024, 512), (9, 512, 384)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (M, K), dtype=jnp.float32)
        w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
        qt = quantize(w)
        y_ref = np.asarray(qmatmul(x, qt, "xla"), np.float32)
        y_pl = np.asarray(qmatmul(x, qt, "pallas"), np.float32)
        err = np.abs(y_pl - y_ref).max()
        print(f"fwd  M={M} K={K} N={N}: max|Δ| = {err:.4f}")
        assert err < 0.1, "forward mismatch"

        g = jax.random.normal(kx, (M, N), dtype=jnp.float32)
        am = absmax_f32(qt)
        dx_pl = np.asarray(
            _qmm_bwd_pallas(g, qt.packed, am, qt.shape, qt.block_size, qt.quant_type),
            np.float32,
        )
        wd = np.asarray(dequantize(qt, jnp.float32))
        dx_ref = np.asarray(g, np.float32) @ wd.T
        err = np.abs(dx_pl - dx_ref).max() / (np.abs(dx_ref).max() + 1e-6)
        print(f"bwd  M={M} K={K} N={N}: rel|Δ| = {err:.4f}")
        assert err < 0.05, "backward mismatch"
    print("correctness OK")


def bench(M=256, K=4096, N=4096, iters=50):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), dtype=jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)

    # NB: pass all arrays as jit args — closure constants are re-uploaded per
    # dispatch through the axon relay and wreck timing.
    f = jax.jit(
        lambda x_, p_, a_: _qmm_pallas(x_, p_, a_, qt.shape, qt.block_size, qt.quant_type)
    )
    y = f(x, qt.packed, am)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, qt.packed, am)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * M * K * N
    w_bytes = K * N // 2 + 4 * K * N // 64
    hbm_bytes = w_bytes + M * K * 2 + M * N * 2
    print(
        f"fused qmm M={M} K={K} N={N}: {dt*1e6:.1f} us, "
        f"{flops/dt/1e12:.2f} TFLOP/s, weight-read {w_bytes/dt/1e9:.1f} GB/s, "
        f"total-HBM {hbm_bytes/dt/1e9:.1f} GB/s"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    check_correctness()
    if args.bench:
        for M in (16, 256, 1024, 4096):
            bench(M=M)
