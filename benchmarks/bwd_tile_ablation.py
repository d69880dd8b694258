"""Backward-kernel tile ablation (dx = g @ W^T) at the training regime.

Run on the TPU chip: finds the (TK, TN, TM) tiling that maximizes MXU
utilization for qmatmul._qmm_bwd_kernel.  Current production: TK=512,
TN=512, TM=1024 → 0.74 MFU (r2 measurement); forward reached 0.93 via
whole-K2 grid steps, so the sweep includes the analogous whole-N options.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)
import jax.numpy as jnp

from qlora_tpu.ops.bench_kernels import qmm_bwd_repeat
from qlora_tpu.quant import quantize
from qlora_tpu.quant.blockwise import absmax_f32

MXU_BF16_TFLOPS = 197.0


def slope(make_fn, r1, r2, tries=5):
    ts = {}
    for R in (r1, r2):
        f = make_fn(R)
        float(f(jnp.float32(0.5)))
        best = float("inf")
        for t in range(tries):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + t)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def main():
    K = N = 4096
    M = 1024
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    base = jax.random.normal(jax.random.PRNGKey(1), (M, N), jnp.float32) * 1e-3

    configs = [
        (512, 512, 1024),   # production today
        (512, 1024, 1024),
        (512, 2048, 1024),
        (1024, 512, 1024),
        (1024, 256, 1024),
        (2048, 256, 1024),
        (2048, 512, 1024),
        (512, 512, 512),
    ]
    for tk, tn, tm in configs:
        def mk(R, tk=tk, tn=tn, tm=tm):
            return jax.jit(lambda c: jnp.sum(qmm_bwd_repeat(
                (base * c).astype(jnp.bfloat16), qt.packed, am, (K, N),
                qt.block_size, qt.quant_type, reps=R, tk=tk, tn=tn,
                tm_max=tm).astype(jnp.float32)))
        try:
            t = slope(mk, r1=160, r2=320)
        except Exception as e:  # noqa: BLE001
            print(f"TK={tk:5d} TN={tn:5d} TM={tm:5d}  FAILED: {str(e)[:80]}")
            continue
        mfu = 2 * M * K * N / t / (MXU_BF16_TFLOPS * 1e12)
        print(f"TK={tk:5d} TN={tn:5d} TM={tm:5d}  {t*1e6:7.1f} µs/rep  "
              f"MFU={mfu:.3f}")


if __name__ == "__main__":
    main()
