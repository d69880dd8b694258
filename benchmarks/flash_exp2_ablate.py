"""Flash fwd exp2-domain ablation (run on the TPU chip).

Hypothesis: jnp.exp lowers to a multiply-by-log2e plus exp2 on the VPU, so
folding sm_scale*log2e into the ONE post-dot multiply and calling exp2
directly removes one f32 multiply per [bq, bk] element from the softmax
critical path — the kernel sits at the VPU/MXU co-schedule floor (DESIGN.md
§6h), so per-element VPU savings are the only lever left.

Measures _flash_fwd(with_lse=False) at the bench shapes (B2 H32 D128,
S=2048 and S=4096, bq=bk=1024) for use_exp2 in {False, True}.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)
import jax.numpy as jnp
import numpy as np

from qlora_tpu.ops.flash_attention import _flash_fwd

MXU_BF16_TFLOPS = 197.0
FLOOR = 0.030


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
    if ts[r1] < 2 * FLOOR:
        print(f"  WARNING r1 wall {ts[r1]*1e3:.1f} ms < 2x dispatch floor")
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def bench_shape(S, r1, r2):
    Bq, Hq, D = 2, 32, 128
    bq = bk = 1024
    kq = jax.random.PRNGKey(3)
    q0 = jax.random.normal(kq, (Bq, Hq, S, D), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.fold_in(kq, 1), (Bq, Hq, S, D),
                           jnp.bfloat16)
    v0 = jax.random.normal(jax.random.fold_in(kq, 2), (Bq, Hq, S, D),
                           jnp.bfloat16)
    lens = jnp.full((Bq,), S, jnp.int32)
    scale = 1.0 / math.sqrt(D)

    gq, gk = S // bq, S // bk
    qi = np.arange(gq)[:, None]
    ki = np.arange(gk)[None, :]
    run_frac = float(((qi + 1) * bq - 1 >= ki * bk).sum()) / (gq * gk)
    flops = 2 * (2 * S * S * D) * Bq * Hq * run_frac

    # numerical agreement across variants at this shape
    o_a = _flash_fwd(q0, k0, v0, lens, scale, True, bq, bk,
                     with_lse=False, use_exp2=False)[0]
    for kw in ({"use_exp2": True}, {"split_k": 2}, {"split_k": 4}):
        o_b = _flash_fwd(q0, k0, v0, lens, scale, True, bq, bk,
                         with_lse=False, **kw)[0]
        diff = float(jnp.max(jnp.abs(o_a.astype(jnp.float32)
                                     - o_b.astype(jnp.float32))))
        print(f"S={S}: max output diff vs base {kw} = {diff:.3e} (bf16 out)")

    for kw in ({"use_exp2": True, "split_k": 2},
               {"use_exp2": True, "split_k": 4},
               {"use_exp2": True, "split_k": 8},
               {"split_k": 8}):
        def mk(R, kw=kw):
            def f(q0, k0, v0, c):
                def body(s, _):
                    o = _flash_fwd(q0 * s.astype(q0.dtype), k0, v0, lens,
                                   scale, True, bq, bk,
                                   with_lse=False, **kw)[0]
                    return s + jnp.sum(
                        o[0, 0, 0, :8].astype(jnp.float32)) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(q0, k0, v0, c)

        t = slope(mk, r1, r2)
        mfu = flops / t / (MXU_BF16_TFLOPS * 1e12)
        print(f"S={S} {kw or 'base'}:  {t*1e6:7.1f} us/call  MFU={mfu:.3f}")


def bench_bwd(S, r1, r2):
    from qlora_tpu.ops.flash_attention import _flash_bwd

    Bq, Hq, D = 2, 32, 128
    bq = bk = 1024
    kq = jax.random.PRNGKey(3)
    q0 = jax.random.normal(kq, (Bq, Hq, S, D), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.fold_in(kq, 1), (Bq, Hq, S, D),
                           jnp.bfloat16)
    v0 = jax.random.normal(jax.random.fold_in(kq, 2), (Bq, Hq, S, D),
                           jnp.bfloat16)
    lens = jnp.full((Bq,), S, jnp.int32)
    scale = 1.0 / math.sqrt(D)
    o, lse = _flash_fwd(q0, k0, v0, lens, scale, True, bq, bk)
    do = jax.random.normal(jax.random.fold_in(kq, 3), o.shape, jnp.bfloat16)

    gq, gk = S // bq, S // bk
    qi = np.arange(gq)[:, None]
    ki = np.arange(gk)[None, :]
    run_frac = float(((qi + 1) * bq - 1 >= ki * bk).sum()) / (gq * gk)
    flops = 7 * (2 * S * S * D) * Bq * Hq * run_frac   # dq 3 + dkv 4 dots

    for kw in ({}, {"split_k": 2}, {"use_exp2": True, "split_k": 2},
               {"use_exp2": True, "split_k": 4}):
        def mk(R, kw=kw):
            def f(q0, k0, v0, o, lse, do, c):
                def body(s, _):
                    dq, dk, dv = _flash_bwd(
                        q0 * s.astype(q0.dtype), k0, v0, lens, o, lse, do,
                        scale, True, bq, bk, **kw)
                    probe = (dq[0, 0, 0, :8] + dk[0, 0, 0, :8]
                             + dv[0, 0, 0, :8])
                    return s + jnp.sum(
                        probe.astype(jnp.float32)) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(q0, k0, v0, o, lse, do, c)

        t = slope(mk, r1, r2)
        mfu = flops / t / (MXU_BF16_TFLOPS * 1e12)
        print(f"bwd S={S} {kw or 'base'}:  {t*1e6:7.1f} us/call  "
              f"MFU={mfu:.3f}")


def main():
    print(f"backend: {jax.default_backend()}")
    if "--bwd" in sys.argv:
        bench_bwd(2048, r1=32, r2=96)
        return
    bench_shape(2048, r1=96, r2=288)
    bench_shape(4096, r1=24, r2=72)


if __name__ == "__main__":
    main()
