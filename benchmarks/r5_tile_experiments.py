"""Round-5 tile experiments (run on the TPU chip) — the measurements
behind DESIGN.md §6i's tiling decisions.

  python benchmarks/r5_tile_experiments.py i8        # i8 kernel TK/TN sweep
  python benchmarks/r5_tile_experiments.py i8_65b    # 65B layer shapes
  python benchmarks/r5_tile_experiments.py ring      # non-causal lse blocks
  python benchmarks/r5_tile_experiments.py causal    # causal long-S blocks
  python benchmarks/r5_tile_experiments.py nf4_65b   # NF4 train @ K=8192

Findings (v5e, 2026-08-21): i8 decode-regime TK=2048/TN=1024 streams
0.92 of HBM SOL vs 0.81 at the r4 1024/512 tiles (confirmed +8% in the
real model; the isolated microkernel OVERSTATES TN=2048); ring interior
chunks want bk=2048 (0.604 → 0.708 MFU) but causal flash does NOT
(2.64 → 3.06 ms at S=4096); the NF4 train kernel plateaus at ~0.79 MFU
at K=8192 for every VMEM-viable tile.
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

MXU = 197.0
HBM = 819.0


def slope(mk, r1, r2, tries=4):
    ts = {}
    for R in (r1, r2):
        f = mk(R)
        float(f(jnp.float32(0.5)))
        best = float("inf")
        for t in range(tries):
            c = jnp.float32(1.0 + t)
            t0 = time.perf_counter()
            float(f(c))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def _i8_setup(K, N, key=1):
    from qlora_tpu.quant import quantize
    from qlora_tpu.quant.blockwise import absmax_f32, dequantize

    kw = jax.random.PRNGKey(key)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w, block_size=64)
    am = absmax_f32(qt)
    col = jnp.max(am, axis=0)
    w8 = jnp.round(dequantize(qt, jnp.float32)
                   * (127.0 / col)[None, :]).astype(jnp.int8)
    s_out = (col / 127.0).reshape(1, N)
    return qt, am, w8, s_out, K * N + 4 * N


def sweep_i8(shapes, Ms=(32, 128), tiles=((1024, 512), (2048, 512),
                                          (2048, 1024), (2048, 2048))):
    from qlora_tpu.ops.bench_kernels import i8_direct_repeat

    kw = jax.random.PRNGKey(1)
    for K, N, tag in shapes:
        _, _, w8, s_out, i8_bytes = _i8_setup(K, N)
        for M in Ms:
            base = jax.random.normal(kw, (M, K), dtype=jnp.float32) * 1e-2
            for tk, tn in tiles:
                if K % tk or N % tn:
                    continue

                def mk(R, tk=tk, tn=tn, base=base, w8=w8, s_out=s_out):
                    def f(c):
                        xf = base * c
                        xs = jnp.max(jnp.abs(xf), axis=1,
                                     keepdims=True) / 127.0
                        x8 = jnp.round(xf / xs).astype(jnp.int8)
                        o = i8_direct_repeat(x8, w8, s_out, (K, N), reps=R,
                                             tk=tk, tn=tn)
                        return jnp.sum(o.astype(jnp.float32) * xs)
                    return jax.jit(f)

                reps = max(1, int(1200 * 4096 * 4096 / (K * N)))
                try:
                    t = slope(mk, reps, 2 * reps)
                    g = i8_bytes / t / 1e9
                    print(f"{tag:15s} M={M:4d} tk={tk:5d} tn={tn:5d}: "
                          f"{g:7.1f} GB/s ({g / HBM:.3f} SOL)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} M={M} tk={tk} tn={tn}: FAILED "
                          f"{str(e)[:80]}", flush=True)
        jax.clear_caches()


def sweep_ring():
    from qlora_tpu.ops.flash_attention import flash_attention_lse

    kq = jax.random.PRNGKey(3)
    Hq, S, D = 32, 2048, 128
    q = jax.random.normal(kq, (1, Hq, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(kq, 8), (1, Hq, S, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(kq, 9), (1, Hq, S, D),
                          jnp.bfloat16)
    lens = jnp.full((1,), S, jnp.int32)
    scale = 1.0 / math.sqrt(D)
    flops = 2 * (2 * S * S * D) * Hq
    for bq, bk in ((1024, 1024), (1024, 2048), (2048, 2048), (512, 2048),
                   (2048, 512)):
        def mk(R, bq=bq, bk=bk):
            def f(q, k, v, c):
                def body(s, _):
                    o, lse = flash_attention_lse(
                        q * s.astype(q.dtype), k, v, lens, sm_scale=scale,
                        causal=False, block_q=bq, block_k=bk)
                    return s + (jnp.sum(o[0, 0, 0, :8].astype(jnp.float32))
                                + jnp.sum(lse[0, 0, :8]) * 1e-30) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(q, k, v, c)

        t = slope(mk, 128, 384)
        print(f"non-causal lse bq={bq:5d} bk={bk:5d}: "
              f"{flops / t / (MXU * 1e12):.3f} MFU", flush=True)


def sweep_causal():
    from qlora_tpu.ops.flash_attention import flash_attention

    kq = jax.random.PRNGKey(3)
    D = 128
    scale = 1.0 / math.sqrt(D)
    for B, H, S, reps in ((2, 32, 4096, 24),):
        q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(kq, 1), (B, H, S, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(kq, 2), (B, H, S, D),
                              jnp.bfloat16)
        lens = jnp.full((B,), S, jnp.int32)
        for bq, bk in ((1024, 1024), (1024, 2048)):
            def mk(R, bq=bq, bk=bk, q=q, k=k, v=v, lens=lens):
                def f(q, k, v, c):
                    def body(s, _):
                        o = flash_attention(q * s.astype(q.dtype), k, v,
                                            lens, sm_scale=scale,
                                            causal=True, block_q=bq,
                                            block_k=bk)
                        return s + jnp.sum(
                            o[0, 0, 0, :8].astype(jnp.float32)) * 1e-30, ()
                    s, _ = jax.lax.scan(body, c, None, length=R)
                    return s
                jf = jax.jit(f)
                return lambda c: jf(q, k, v, c)

            t = slope(mk, reps, 3 * reps)
            print(f"causal S={S} bq={bq:5d} bk={bk:5d}: {t * 1e3:7.2f} "
                  "ms/call", flush=True)


def sweep_nf4_65b():
    from qlora_tpu.ops.bench_kernels import qmm_repeat
    from qlora_tpu.quant import quantize
    from qlora_tpu.quant.blockwise import absmax_f32

    kw = jax.random.PRNGKey(1)
    K, N = 8192, 8192
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w, block_size=64)
    am = absmax_f32(qt)
    M3 = 1024
    base3 = jax.random.normal(kw, (M3, K), dtype=jnp.float32) * 1e-3
    for tm, tkp, tn in ((1024, 1024, 256), (512, 2048, 256),
                        (256, 2048, 512)):
        def mk(R, tm=tm, tkp=tkp, tn=tn):
            return jax.jit(lambda c: jnp.sum(qmm_repeat(
                (base3 * c).astype(jnp.bfloat16), qt.packed, am,
                qt.shape, qt.block_size, qt.quant_type, reps=R,
                tkp_max=tkp, tn_max=tn, tm_max=tm).astype(jnp.float32)))

        try:
            t = slope(mk, 50, 100)
            print(f"nf4 K=8192 tm={tm:5d} tkp={tkp:5d} tn={tn:4d}: "
                  f"{2 * M3 * K * N / t / (MXU * 1e12):.3f} MFU", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"nf4 tm={tm} tkp={tkp} tn={tn}: FAILED {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "i8"
    print(f"backend: {jax.default_backend()}", flush=True)
    if which == "i8":
        sweep_i8(((4096, 4096, "qkv/wo"), (4096, 14336, "gate/up"),
                  (14336, 4096, "down"), (4096, 32768, "lm_head_pad")))
    elif which == "i8_65b":
        sweep_i8(((8192, 8192, "65b qkv/wo"), (8192, 21504, "65b gate/up~")),
                 Ms=(128,), tiles=((2048, 1024),))
    elif which == "ring":
        sweep_ring()
    elif which == "causal":
        sweep_causal()
    elif which == "nf4_65b":
        sweep_nf4_65b()
    else:
        raise SystemExit(f"unknown experiment {which!r}")
