"""Round benchmark — prints ONE JSON line for the driver.

Headline metric: weight-read bandwidth of the decode-SERVING kernel
(per-column int8 weights, direct int8 MXU dot — the path PagedBatcher
uses with decode_impl="int8") at the default serving batch M=128 on a
7B-class layer (K=N=4096).  ``vs_baseline`` = fraction of v5e HBM
speed-of-light (819 GB/s) over the bytes the kernel ACTUALLY reads —
the BASELINE.json per-kernel north star.

``extra_metrics`` carries the rest of the perf story: the exact bf16 NF4
fused kernel in the decode regime (M=16 — round-1's headline — and at the
M=128 serving batch) and the training-regime MXU utilisation at M=1024.

Measurement method: the dispatch path on this box caches identical execute
requests, so each timed call derives its inputs from a fresh scalar counter
and repeats the kernel R× inside one pallas dispatch; the (R2−R1) slope
isolates device time from RPC overhead (docs/DESIGN.md §6).
"""

import json
import sys
import threading
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable
_cc_enable(jax)
import jax.numpy as jnp


HBM_PEAK_GBPS = 819.0      # TPU v5e
MXU_BF16_TFLOPS = 197.0    # TPU v5e chip peak (bf16)

# ---- deadline watchdog -----------------------------------------------------
# The driver runs bench.py under an external timeout (round 2: rc=124, the
# JSON line never printed and the whole round's perf work went unrecorded).
# Sections publish results into _RESULTS as they finish; a watchdog thread
# emits the one JSON line with whatever has been measured when the budget
# expires and hard-exits.  Order of battle (microkernels → flash → product)
# puts the cheap high-value metrics first.
_DEADLINE = float(os.environ.get("QLORA_BENCH_DEADLINE", "1140"))  # 19 min
_T0 = time.time()
_RESULTS = {"headline": None, "extras": []}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit():
    """Print the single driver-facing JSON line (idempotent)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        headline, extras = _RESULTS["headline"], list(_RESULTS["extras"])
        if headline is None:
            # headline failed/never ran: promote the best surviving extra so
            # the driver still records a real measurement
            real = [e for e in extras if not e["metric"].endswith("_error")]
            headline = (real[0] if real else
                        {"metric": "bench_failed", "value": 0, "unit": "",
                         "vs_baseline": 0.0})
            extras = [e for e in extras if e is not headline]
        print(json.dumps({**headline, "extra_metrics": extras}), flush=True)


def _watchdog():
    _emit()
    sys.stderr.write(f"bench watchdog: deadline {_DEADLINE:.0f}s hit, "
                     "emitted partial results\n")
    os._exit(0)


def _remaining():
    return _DEADLINE - (time.time() - _T0)


def _log(msg):
    sys.stderr.write(f"[bench +{time.time() - _T0:6.1f}s] {msg}\n")
    sys.stderr.flush()


_DISPATCH_FLOOR = 0.030   # s — the relay's fixed per-dispatch cost


def _slope(make_fn, r1=8, r2=56, tries=8, max_grow=3):
    """Per-repeat device time from the (R2−R1) wall-clock slope.

    CRITICAL: the relay has a ~30 ms fixed dispatch floor that wall-clock
    sits on until R×per_rep exceeds it — a slope taken on points near the
    floor measures noise and can report impossible numbers (BENCH_r03's
    1.025 MFU came from r1=80 × ~180 µs ≈ 14 ms < floor).  The floor rule
    is now ENFORCED, not advisory: if the smaller point's wall-clock is
    under 2× the floor, both rep counts are scaled ×4 and re-measured."""
    for grow in range(max_grow + 1):
        ts = {}
        for R in (r1, r2):
            f = make_fn(R)
            float(f(jnp.float32(0.5)))   # warmup/compile
            best = float("inf")
            for t in range(tries):
                c = jnp.float32(1.0 + t)
                t0 = time.perf_counter()
                # host materialization: block_until_ready can return before
                # the device finishes on this relay (see docs/DESIGN.md §6)
                float(f(c))
                best = min(best, time.perf_counter() - t0)
            ts[R] = best
        if ts[r1] >= 2 * _DISPATCH_FLOOR or grow == max_grow or _remaining() < 90:
            if ts[r1] < 2 * _DISPATCH_FLOOR:
                _log(f"slope WARNING: r1={r1} wall {ts[r1]*1e3:.1f} ms still "
                     "under 2x dispatch floor; result may be noisy")
            break
        _log(f"slope: r1={r1} wall {ts[r1]*1e3:.1f} ms < 2x floor, growing x4")
        r1, r2 = r1 * 4, r2 * 4
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def _mfu_slope(mk, r1, r2, tries, flops):
    """Slope → MFU with ONE doubled-reps retry if the first read lands
    above 1.0 (noise can overshoot a true ~0.93 even above the dispatch
    floor; a retry at 2× reps resolves it before _push has to flag)."""
    for scale in (1, 2):
        t = _slope(mk, r1 * scale, r2 * scale, tries)
        mfu = flops / t / (MXU_BF16_TFLOPS * 1e12)
        if mfu <= 1.0:
            return mfu
        _log(f"mfu {mfu:.3f} > 1.0 at r1={r1 * scale}; retrying doubled")
    return mfu


def _push(extras, metric):
    """Append a metric with a physical-plausibility rail: every vs_baseline
    here is a fraction of a hardware bound (MXU peak / HBM speed-of-light),
    so a value > 1.0 is a measurement failure, not a result.  Such metrics
    are emitted as *_implausible with vs_baseline 0 — the scoreboard never
    carries an impossible number (VERDICT r3 weak #2)."""
    if metric["vs_baseline"] > 1.0:
        _log(f"IMPLAUSIBLE metric {metric['metric']} = "
             f"{metric['vs_baseline']} of a hardware bound; flagging")
        metric = {**metric, "metric": metric["metric"] + "_implausible",
                  "vs_baseline": 0.0}
    extras.append(metric)
    return metric


def main():
    from qlora_tpu.ops.bench_kernels import i8_direct_repeat, qmm_repeat
    from qlora_tpu.quant import quantize
    from qlora_tpu.quant.blockwise import absmax_f32, dequantize

    wd = threading.Timer(_DEADLINE, _watchdog)
    wd.daemon = True
    wd.start()

    K, N = 4096, 4096
    kw = jax.random.PRNGKey(1)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    nf4_bytes = K * N // 2 + K * N // 64 + 4 * K * N // 64 // 256

    # serving copy: per-column int8 (generate/serve_int8.py equivalent)
    col = jnp.max(am, axis=0)
    w8 = jnp.round(dequantize(qt, jnp.float32) * (127.0 / col)[None, :]
                   ).astype(jnp.int8)
    s_out = (col / 127.0).reshape(1, N)
    i8_bytes = K * N + 4 * N

    extras = _RESULTS["extras"]   # sections publish as they finish so the
    # watchdog can emit partial results at the deadline

    # every section individually guarded: the relay's compile service can
    # die mid-bench (observed round 2) and the driver must still get its
    # one JSON line with whatever was measured before the failure
    def _guard(name, fn):
        _log(f"section {name} start")
        try:
            r = fn()
            _log(f"section {name} done")
            return r
        except Exception as e:  # noqa: BLE001
            _log(f"section {name} FAILED: {e}")
            extras.append({"metric": f"{name}_error", "value": 0,
                           "unit": str(e)[:120], "vs_baseline": 0.0})
            return None

    # 1) headline: int8 serving decode kernel at the M=128 serving batch
    def _headline():
        M = 128
        base = jax.random.normal(kw, (M, K), dtype=jnp.float32) * 1e-2

        def mk_i8(R):
            def f(c):
                xf = base * c
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                x8 = jnp.round(xf / xs).astype(jnp.int8)
                # tn=2048 mirrors the production decode-regime tiles
                # (r5 sweep: 0.81 → 0.92 SOL over tn=512)
                o = i8_direct_repeat(x8, w8, s_out, (K, N), reps=R, tk=2048,
                                     tn=2048)
                return jnp.sum(o.astype(jnp.float32) * xs)
            return jax.jit(f)

        t = _slope(mk_i8, r1=1200, r2=2400, tries=6)
        head_gbps = i8_bytes / t / 1e9
        m = {
            "metric": "decode_serving_weight_read",
            "value": round(head_gbps, 1),
            "unit": "GB/s",
            "vs_baseline": round(head_gbps / HBM_PEAK_GBPS, 3),
        }
        if m["vs_baseline"] > 1.0:   # > HBM speed-of-light: not a result
            _log("IMPLAUSIBLE headline; demoting to extras")
            _push(extras, m)
            return None
        return m

    _RESULTS["headline"] = _guard("decode_serving", _headline)

    # 2) exact NF4 kernel, decode regime M=16 (round-1 compat metric)
    def _nf4_decode():
        for M2 in (16, 128):
            base2 = jax.random.normal(kw, (M2, K), dtype=jnp.float32) * 1e-3

            def mk_nf4(R, base2=base2, M2=M2):
                tkp = 2048 if M2 <= 64 else 512
                return jax.jit(lambda c: jnp.sum(qmm_repeat(
                    (base2 * c).astype(jnp.bfloat16), qt.packed, am,
                    qt.shape, qt.block_size, qt.quant_type, reps=R,
                    tkp_max=tkp).astype(jnp.float32)))

            t2 = _slope(mk_nf4, r1=1200, r2=2400, tries=6)
            g2 = nf4_bytes / t2 / 1e9
            _push(extras, {
                "metric": f"nf4_fused_matmul_weight_read_m{M2}",
                "value": round(g2, 1), "unit": "GB/s",
                "vs_baseline": round(g2 / HBM_PEAK_GBPS, 3),
            })

    _guard("nf4_decode", _nf4_decode)

    # 3) training-regime MXU utilisation (M=1024, exact bf16 kernel)
    def _nf4_train():
        M3 = 1024
        base3 = jax.random.normal(kw, (M3, K), dtype=jnp.float32) * 1e-3

        def mk_train(R):
            # mirror the production large-M tiles (TKp=2048/TN=256 — whole
            # K2 per grid step; measured 0.93 MFU vs 0.81 at TKp=512/TN=512)
            return jax.jit(lambda c: jnp.sum(qmm_repeat(
                (base3 * c).astype(jnp.bfloat16), qt.packed, am,
                qt.shape, qt.block_size, qt.quant_type, reps=R,
                tkp_max=2048, tn_max=256).astype(jnp.float32)))

        mfu = _mfu_slope(mk_train, 400, 800, 6, 2 * M3 * K * N)
        _push(extras, {
            "metric": "nf4_train_regime_mxu_util_m1024",
            "value": round(mfu, 3), "unit": "fraction_of_bf16_peak",
            "vs_baseline": round(mfu, 3),
        })

    _guard("nf4_train", _nf4_train)

    # 3b) backward kernel (dx = g @ Wᵀ) MXU utilisation at M=1024 — the
    # r3 ablation winner (TK=512, TN=2048, TM=1024; 0.93 MFU on v5e),
    # now the production _qmm_bwd_pallas tile policy
    def _nf4_bwd():
        from qlora_tpu.ops.bench_kernels import qmm_bwd_repeat

        Mb = 1024
        gb = jax.random.normal(kw, (Mb, N), dtype=jnp.float32) * 1e-3

        def mk_bwd(R):
            return jax.jit(lambda c: jnp.sum(qmm_bwd_repeat(
                (gb * c).astype(jnp.bfloat16), qt.packed, am, (K, N),
                qt.block_size, qt.quant_type, reps=R, tk=512, tn=2048,
                tm_max=1024).astype(jnp.float32)))

        mfu = _mfu_slope(mk_bwd, 640, 1280, 5, 2 * Mb * K * N)
        _push(extras, {
            "metric": "nf4_bwd_mxu_util_m1024",
            "value": round(mfu, 3), "unit": "fraction_of_bf16_peak",
            "vs_baseline": round(mfu, 3),
        })

    _guard("nf4_bwd", _nf4_bwd)

    # 4) PRODUCT metrics (BASELINE.json headline: "NF4 decode tokens/s/chip
    # and finetune step-time at 7B"): full 7B-class model, one jit'd loop of
    # R steps — slope isolates device time.  Ordered BEFORE flash: the
    # decode tokens/s numbers are the round's primary deliverable and the
    # relay can stall any section for minutes — the watchdog must not
    # starve them.  Guarded: a failure here must not kill the microkernel
    # metrics.
    # 4b) serving engine as a SYSTEM: PagedBatcher under a saturating
    # arrival trace — time-to-first-token and sustained tokens/s with
    # prefill/admission interleaved with decode (the north-star continuous
    # batching feature measured end-to-end, not at steady state).
    # Ordered BEFORE product/flash: the 32-slot throughput config runs the
    # chip near-full (NF4 + int8 + 2.4 GB pools) and needs the least
    # allocator churn ahead of it (r4: same trace OOM'd when run last but
    # passed in a fresh process).
    if _remaining() > float(os.environ.get("QLORA_BENCH_SERVING_MIN", "240")):
        _guard("serving_metrics", lambda: extras.extend(_serving_metrics()))
    else:
        _log("skipping serving metrics: insufficient budget remaining")

    # 4a) single-stream B=1 (int8 + speculative) — the round-4 headline
    # capability, now driver-visible (VERDICT r4 weak #1/#2); subprocess
    # for the same HBM-reclaim reason as serving
    if _remaining() > float(os.environ.get("QLORA_BENCH_B1_MIN", "300")):
        _guard("b1_metrics", lambda: extras.extend(_b1_metrics()))
    else:
        _log("skipping b1 metrics: insufficient budget remaining")

    if _remaining() > float(os.environ.get("QLORA_BENCH_PRODUCT_MIN", "300")):
        _guard("product_metrics", lambda: extras.extend(_product_metrics()))
    else:
        _log("skipping product metrics: insufficient budget remaining")

    # 5) flash attention MFU at the 7B training shape (S=2048, causal).
    if _remaining() > 120:
        _guard("flash_metrics", lambda: extras.extend(_flash_metrics()))
    else:
        _log("skipping flash metrics: insufficient budget remaining")

    wd.cancel()
    _emit()


def _scan_slope(mk, r1, r2, tries=4):
    ts = {}
    for R in (r1, r2):
        f = mk(R)
        float(f(jnp.int32(1)))   # warmup/compile
        best = float("inf")
        for t in range(tries):
            t0 = time.perf_counter()
            float(f(jnp.int32(2 + t)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def _dyn_slope(f, r1, r2, tries=4):
    """Slope timing for f(seed, R) with DYNAMIC repeat count R — the 7B
    product programs compile once per metric instead of once per R point
    (each cold 7B compile is a multi-minute remote_compile request that can
    crash the relay's compile service; halving the count matters more than
    scan-vs-while_loop microstructure)."""
    float(f(jnp.int32(1), jnp.int32(r1)))   # single compile + warmup
    ts = {}
    for R in (r1, r2):
        best = float("inf")
        for t in range(tries):
            t0 = time.perf_counter()
            float(f(jnp.int32(2 + t), jnp.int32(R)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


def _flash_metrics():
    """Flash-attention fwd and train (fwd+bwd) MFU, 7B shape B2·H32·S2048·D128.

    MFU denominators count only the EXECUTED causal tiles (lower-triangle
    blocks of the bq×bk grid), so 1.0 = MXU peak on the work actually run —
    comparable to the NF4 train-regime metric.
    """
    import math

    from qlora_tpu.ops.flash_attention import flash_attention

    Bq, Hq, S, D = 2, 32, 2048, 128
    bq, bk = 1024, 1024   # production default tiles (r4 ablation)
    kq = jax.random.PRNGKey(3)
    q0 = jax.random.normal(kq, (Bq, Hq, S, D), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.fold_in(kq, 1), (Bq, Hq, S, D),
                           jnp.bfloat16)
    v0 = jax.random.normal(jax.random.fold_in(kq, 2), (Bq, Hq, S, D),
                           jnp.bfloat16)
    lens = jnp.full((Bq,), S, jnp.int32)
    scale = 1.0 / math.sqrt(D)

    gq, gk = S // bq, S // bk
    qi = __import__("numpy").arange(gq)[:, None]
    ki = __import__("numpy").arange(gk)[None, :]
    run_frac = float(((qi + 1) * bq - 1 >= ki * bk).sum()) / (gq * gk)
    # matmuls of 2·S²·D flops each: fwd kernel 2; bwd dq 3 + dkv 4 (di
    # precompute is elementwise, ignored)
    fwd_flops = 2 * (2 * S * S * D) * Bq * Hq * run_frac
    bwd_flops = 7 * (2 * S * S * D) * Bq * Hq * run_frac

    def mk_fwd(R):
        # q0/k0/v0 as jit args (96 MB of bf16) keeps the remote-compile
        # payload to the HLO alone — same fix as the product section
        def f(q0, k0, v0, c):
            def body(s, _):
                o = flash_attention(q0 * s.astype(q0.dtype), k0, v0, lens,
                                    sm_scale=scale, causal=True)
                return s + jnp.sum(o[0, 0, 0, :8].astype(jnp.float32)) * 1e-30, ()
            s, _ = jax.lax.scan(body, c, None, length=R)
            return s
        jf = jax.jit(f)
        return lambda c: jf(q0, k0, v0, c)

    t_f = _slope(mk_fwd, r1=96, r2=288, tries=5)
    out = []
    _push(out, {
        "metric": "flash_attention_fwd_mfu_s2048",
        "value": round(fwd_flops / t_f / (MXU_BF16_TFLOPS * 1e12), 3),
        "unit": "fraction_of_bf16_peak",
        "vs_baseline": round(fwd_flops / t_f / (MXU_BF16_TFLOPS * 1e12), 3),
    })

    def loss(qq, kk, vv):
        return jnp.sum(flash_attention(
            qq, kk, vv, lens, sm_scale=scale, causal=True
        ).astype(jnp.float32) * 1e-3)

    def mk_train(R):
        def f(q0, k0, v0, c):
            def body(s, _):
                # grads w.r.t. all three operands — otherwise XLA DCEs the
                # whole dkv kernel and the MFU denominator overcounts
                dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(
                    q0 * s.astype(q0.dtype), k0, v0)
                probe = (dq[0, 0, 0, :8] + dk[0, 0, 0, :8] + dv[0, 0, 0, :8])
                return s + jnp.sum(probe.astype(jnp.float32)) * 1e-30, ()
            s, _ = jax.lax.scan(body, c, None, length=R)
            return s
        jf = jax.jit(f)
        return lambda c: jf(q0, k0, v0, c)

    t_t = _slope(mk_train, r1=24, r2=72, tries=5)
    tot = fwd_flops + bwd_flops
    _push(out, {
        "metric": "flash_attention_train_mfu_s2048",
        "value": round(tot / t_t / (MXU_BF16_TFLOPS * 1e12), 3),
        "unit": "fraction_of_bf16_peak",
        "vs_baseline": round(tot / t_t / (MXU_BF16_TFLOPS * 1e12), 3),
    })

    # long-context point (the ring/SP path multiplies this kernel)
    S4 = 4096
    q4 = jax.random.normal(kq, (Bq, Hq, S4, D), jnp.bfloat16)
    k4 = jax.random.normal(jax.random.fold_in(kq, 4), (Bq, Hq, S4, D),
                           jnp.bfloat16)
    v4 = jax.random.normal(jax.random.fold_in(kq, 5), (Bq, Hq, S4, D),
                           jnp.bfloat16)
    lens4 = jnp.full((Bq,), S4, jnp.int32)
    gq4, gk4 = S4 // bq, S4 // bk
    qi4 = __import__("numpy").arange(gq4)[:, None]
    ki4 = __import__("numpy").arange(gk4)[None, :]
    rf4 = float(((qi4 + 1) * bq - 1 >= ki4 * bk).sum()) / (gq4 * gk4)
    f4_flops = 2 * (2 * S4 * S4 * D) * Bq * Hq * rf4

    def mk_fwd4(R):
        def f(q4, k4, v4, c):
            def body(s, _):
                o = flash_attention(q4 * s.astype(q4.dtype), k4, v4, lens4,
                                    sm_scale=scale, causal=True)
                return s + jnp.sum(o[0, 0, 0, :8].astype(jnp.float32)) * 1e-30, ()
            s, _ = jax.lax.scan(body, c, None, length=R)
            return s
        jf = jax.jit(f)
        return lambda c: jf(q4, k4, v4, c)

    t4 = _slope(mk_fwd4, r1=24, r2=72, tries=4)
    _push(out, {
        "metric": "flash_attention_fwd_mfu_s4096",
        "value": round(f4_flops / t4 / (MXU_BF16_TFLOPS * 1e12), 3),
        "unit": "fraction_of_bf16_peak",
        "vs_baseline": round(f4_flops / t4 / (MXU_BF16_TFLOPS * 1e12), 3),
    })

    # S=4096 TRAIN (fwd+bwd) — the long-context gradient path
    if _remaining() > 150:
        def loss4(qq, kk, vv):
            return jnp.sum(flash_attention(
                qq, kk, vv, lens4, sm_scale=scale, causal=True
            ).astype(jnp.float32) * 1e-3)

        def mk_train4(R):
            def f(q4, k4, v4, c):
                def body(s, _):
                    dq, dk, dv = jax.grad(loss4, argnums=(0, 1, 2))(
                        q4 * s.astype(q4.dtype), k4, v4)
                    probe = (dq[0, 0, 0, :8] + dk[0, 0, 0, :8]
                             + dv[0, 0, 0, :8])
                    return s + jnp.sum(probe.astype(jnp.float32)) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(q4, k4, v4, c)

        tt4 = _slope(mk_train4, r1=8, r2=24, tries=4)
        tot4 = f4_flops + 3.5 * f4_flops   # bwd = 7 dots vs fwd's 2
        _push(out, {
            "metric": "flash_attention_train_mfu_s4096",
            "value": round(tot4 / tt4 / (MXU_BF16_TFLOPS * 1e12), 3),
            "unit": "fraction_of_bf16_peak",
            "vs_baseline": round(tot4 / tt4 / (MXU_BF16_TFLOPS * 1e12), 3),
        })

    # S=8192 fwd — the finetune_longcontext_sp.sh global sequence length
    # (ring attention multiplies the per-chunk kernel measured below)
    if _remaining() > 150:
        S8 = 8192
        q8 = jax.random.normal(kq, (1, Hq, S8, D), jnp.bfloat16)
        k8 = jax.random.normal(jax.random.fold_in(kq, 6), (1, Hq, S8, D),
                               jnp.bfloat16)
        v8 = jax.random.normal(jax.random.fold_in(kq, 7), (1, Hq, S8, D),
                               jnp.bfloat16)
        lens8 = jnp.full((1,), S8, jnp.int32)
        gq8, gk8 = S8 // bq, S8 // bk
        qi8 = __import__("numpy").arange(gq8)[:, None]
        ki8 = __import__("numpy").arange(gk8)[None, :]
        rf8 = float(((qi8 + 1) * bq - 1 >= ki8 * bk).sum()) / (gq8 * gk8)
        f8_flops = 2 * (2 * S8 * S8 * D) * 1 * Hq * rf8

        def mk_fwd8(R):
            def f(q8, k8, v8, c):
                def body(s, _):
                    o = flash_attention(q8 * s.astype(q8.dtype), k8, v8,
                                        lens8, sm_scale=scale, causal=True)
                    return s + jnp.sum(
                        o[0, 0, 0, :8].astype(jnp.float32)) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(q8, k8, v8, c)

        t8 = _slope(mk_fwd8, r1=12, r2=36, tries=4)
        _push(out, {
            "metric": "flash_attention_fwd_mfu_s8192",
            "value": round(f8_flops / t8 / (MXU_BF16_TFLOPS * 1e12), 3),
            "unit": "fraction_of_bf16_peak",
            "vs_baseline": round(f8_flops / t8 / (MXU_BF16_TFLOPS * 1e12), 3),
        })

    # ring-attention interior chunk: flash_attention_lse NON-causal at the
    # sp=4 local shape of finetune_longcontext_sp.sh (B=1, Sq=Sk=2048) —
    # the op each rotation of the ring executes N-1 times; its MFU is the
    # ring path's per-chip ceiling (ops/ring_attention.py)
    if _remaining() > 120:
        from qlora_tpu.ops.flash_attention import flash_attention_lse

        qr = jax.random.normal(kq, (1, Hq, 2048, D), jnp.bfloat16)
        kr = jax.random.normal(jax.random.fold_in(kq, 8), (1, Hq, 2048, D),
                               jnp.bfloat16)
        vr = jax.random.normal(jax.random.fold_in(kq, 9), (1, Hq, 2048, D),
                               jnp.bfloat16)
        lensr = jnp.full((1,), 2048, jnp.int32)
        rc_flops = 2 * (2 * 2048 * 2048 * D) * 1 * Hq   # full grid, no mask

        def mk_ring(R):
            def f(qr, kr, vr, c):
                def body(s, _):
                    # bq/bk mirror ring_attention._ring_flash (r5: bk=2048
                    # lifts the non-causal chunk 0.604 -> 0.708 MFU)
                    o, lse = flash_attention_lse(
                        qr * s.astype(qr.dtype), kr, vr, lensr,
                        sm_scale=scale, causal=False, block_q=1024,
                        block_k=2048)
                    return s + (jnp.sum(o[0, 0, 0, :8].astype(jnp.float32))
                                + jnp.sum(lse[0, 0, :8]) * 1e-30) * 1e-30, ()
                s, _ = jax.lax.scan(body, c, None, length=R)
                return s
            jf = jax.jit(f)
            return lambda c: jf(qr, kr, vr, c)

        tr = _slope(mk_ring, r1=64, r2=192, tries=4)
        _push(out, {
            "metric": "ring_chunk_flash_mfu_sq2048",
            "value": round(rc_flops / tr / (MXU_BF16_TFLOPS * 1e12), 3),
            "unit": "fraction_of_bf16_peak (non-causal lse chunk, sp=4 "
                    "local shape)",
            "vs_baseline": round(rc_flops / tr / (MXU_BF16_TFLOPS * 1e12), 3),
        })
    return out


def _product_metrics():
    """7B-class GQA decode tokens/s (serving int8 path) + finetune step time."""
    from qlora_tpu.lora import LoraConfig
    from qlora_tpu.models import forward, init_lora_params, init_params
    from qlora_tpu.models.config import ModelConfig
    from qlora_tpu.models.transformer import init_cache
    from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

    out = []
    small = bool(os.environ.get("QLORA_BENCH_SMALL"))  # CPU smoke mode
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8,   # 7B-class GQA (Mistral-7B shape) — serving flagship
    ) if not small else ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    lcfg = LoraConfig(r=64 if not small else 4, alpha=16)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)

    # --- finetune step time FIRST (NF4 tree only; HBM budget: the int8
    # serving copy + KV pool don't fit alongside NF4 + train state) ---
    from qlora_tpu.models import init_lora_params
    from qlora_tpu.train import init_train_state, make_optimizer, make_train_step

    S = 512 if not small else 32
    lora_t = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 2e-4, total_steps=100)
    state = init_train_state(lora_t, opt)
    step_fn = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)
    ids = jnp.ones((2, S), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    # params/state/batch are jit ARGUMENTS: closure-capturing the 7B trees
    # bakes them into the HLO as constants (observed: a 6.14 GB compile
    # payload that the relay's remote_compile service choked on for 40+
    # minutes in the round-3 probe) — as arguments the payload is the HLO
    # alone and the trees stay resident device buffers
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

    t_step = _dyn_slope(
        lambda seed, R: f_step(params, state, batch, seed, R),
        r1=1, r2=3, tries=3)
    # speed-of-light: ~6·tokens·P_linear matmul FLOPs (fwd + remat-fwd + dx)
    p_lin = (cfg.hidden_size * cfg.hidden_size *
             (2 + 2 * cfg.num_kv_heads / cfg.num_heads) +
             3 * cfg.hidden_size * cfg.intermediate_size) * cfg.num_layers
    tokens = ids.size
    sol = 6 * tokens * p_lin / (MXU_BF16_TFLOPS * 1e12)
    _push(out, {
        "metric": "finetune_step_time_7b_1k_tokens",
        "value": round(t_step, 3), "unit": "s/step",
        "vs_baseline": round(sol / t_step, 3),
    })
    # drop the train section's device state AND its jit cache — the params
    # tree is closure-captured into compiled executables and stays in HBM
    # until the cache is cleared
    del state, lora_t, step_fn, f_step
    jax.clear_caches()

    # --- decode tokens/s at B=32, ctx 512 (int8 serving weights) ---
    B, CTX, CAP = (32, 512, 768) if not small else (4, 16, 32)
    from qlora_tpu.generate.serve_int8 import requantize_params_int8
    from qlora_tpu.models.unstack import unstack_cache, unstack_params

    # UNSTACKED (per-layer list) trees: lax.scan's per-layer dynamic
    # slices of the stacked weights/cache materialize as HBM copies around
    # the pallas kernels and dominated the step (47.6 → 17.4 ms measured);
    # forward() unrolls the layer loop over lists.  HBM budget: free the
    # NF4 tree BEFORE unstacking (stacked int8 + unstacked int8 coexist
    # transiently — with NF4 alive too the peak exceeds 16 GB)
    dec_params = requantize_params_int8(params)
    del params    # embed/norms/lm_head are shared, stay live
    dec_params = unstack_params(dec_params)
    lora = None
    toks0 = jnp.full((B, 1), 7, jnp.int32)

    from qlora_tpu.ops.qmatmul import default_impl

    # dec_params as a jit ARGUMENT for the same compile-payload reason; the
    # KV cache is built INSIDE the jit (zeros = HLO broadcasts) so the while
    # loop can alias it as a temp instead of double-buffering a 3 GB
    # argument (observed HBM OOM: two 1.5 GB AllocateBuffer temps on top of
    # the cache argument).  Per-call init cost cancels in the _dyn_slope.
    @jax.jit
    def f_decode(dec_params, seed, R):
        # pre-fill a CTX-token context cheaply: mark length; contents zeros
        cache0 = unstack_cache(dict(init_cache(cfg, B, CAP),
                                    length=jnp.full((B,), CTX, jnp.int32)))

        def cond(c):
            return c[0] < R

        def body(c):
            i, cache, toks, acc = c
            # w8a8 impl override routes the per-column int8 QLinears to
            # the direct int8 MXU kernel (the PagedBatcher decode path)
            with default_impl("w8a8"):
                logits, cache = forward(dec_params, lora, toks, cfg, lcfg,
                                        cache=cache)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (i + 1, cache, nxt[:, None] + seed * 0,
                    acc + jnp.sum(nxt))

        _, _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cache0, toks0 + seed, jnp.int32(0)))
        return acc

    t_dec = _dyn_slope(
        lambda seed, R: f_decode(dec_params, seed, R), r1=8, r2=24)
    tps = B / t_dec
    # speed-of-light: weight-limited decode = int8 bytes / HBM peak per step
    # bytes the decode step actually streams: every weight except the embed
    # table (row-gathered per token, not streamed)
    p_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(
            {k: v for k, v in dec_params.items() if k != "embed"})
        if hasattr(x, "dtype")
    )
    # ... plus the KV cache: the contiguous decode path reads the full
    # static CAP buffer each step (masked), 2 planes × KVH × hd bf16
    kv_bytes = (B * CAP * cfg.num_layers * 2 * cfg.num_kv_heads *
                cfg.head_dim * 2)
    sol_tps = B / ((p_bytes + kv_bytes) / (HBM_PEAK_GBPS * 1e9))
    _push(out, {
        "metric": f"decode_tokens_per_s_7b_gqa_b{B}",
        "value": round(tps, 1), "unit": "tokens/s/chip",
        "vs_baseline": round(tps / sol_tps, 3),
    })

    # --- decode tokens/s, PAGED serving path (the PagedBatcher flagship:
    # page-pool KV + fused paged decode kernel + int8 weights) ---
    ps = 64 if not small else 8   # PagedPool's TPU default page size
    n_seq_pages = CAP // ps
    L_, KVH_, hd_ = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim

    @jax.jit
    def f_decode_paged(dec_params, seed, R):
        # per-layer pool LISTS built in-jit (zeros) for while-loop aliasing;
        # tables are the static page ranges PagedBatcher would allocate
        k_pages = [jnp.zeros((1 + B * n_seq_pages, KVH_, ps, hd_),
                             jnp.bfloat16) for _ in range(L_)]
        v_pages = [jnp.zeros((1 + B * n_seq_pages, KVH_, ps, hd_),
                             jnp.bfloat16) for _ in range(L_)]
        tables = (1 + jnp.arange(B)[:, None] * n_seq_pages
                  + jnp.arange(n_seq_pages)[None, :]).astype(jnp.int32)
        cache0 = {"k_pages": k_pages, "v_pages": v_pages, "tables": tables,
                  "length": jnp.full((B,), CTX, jnp.int32)}

        def cond(c):
            return c[0] < R

        def body(c):
            i, cache, toks, acc = c
            with default_impl("w8a8"):
                logits, cache = forward(dec_params, lora, toks, cfg, lcfg,
                                        cache=cache)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (i + 1, cache, nxt[:, None] + seed * 0,
                    acc + jnp.sum(nxt))

        _, _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cache0, toks0 + seed, jnp.int32(0)))
        return acc

    t_pg = _dyn_slope(
        lambda seed, R: f_decode_paged(dec_params, seed, R), r1=8, r2=24)
    tps_pg = B / t_pg
    _push(out, {
        "metric": f"decode_tokens_per_s_7b_gqa_b{B}_paged",
        "value": round(tps_pg, 1), "unit": "tokens/s/chip",
        "vs_baseline": round(tps_pg / sol_tps, 3),
    })
    return out


def _b1_metrics():
    """B=1 single-stream decode (int8 serving copy incl. int8 lm_head) and
    prompt-lookup speculation on top — benchmarks/single_stream_decode.py
    in a subprocess.  vs_baseline: int8 weight-streaming bound for the
    int8 row; bound × measured tokens-per-chunk (the acceptance-determined
    ceiling) for the speculative row."""
    import json as _json
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "single_stream_decode.py")
    to = max(min(_remaining() - 20, 1500), 120)
    r = subprocess.run([_sys.executable, script, "--json"],
                       capture_output=True, text=True, timeout=to)
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        raise RuntimeError(f"b1 subprocess rc={r.returncode}: "
                           f"{(r.stderr or r.stdout)[-200:]}")
    d = _json.loads(lines[-1])
    out = []
    _push(out, {
        "metric": "decode_tokens_per_s_7b_b1_int8",
        "value": d["b1_int8_tok_s"],
        "unit": "tokens/s (B=1 rollout slope, int8 serving copy)",
        "vs_baseline": d["b1_int8_vs_bound"],
    })
    _push(out, {
        "metric": "decode_tokens_per_s_7b_b1_spec",
        "value": d["b1_spec_tok_s"],
        "unit": f"tokens/s (B=1, prompt-lookup draft 8, "
                f"{d['b1_tok_per_chunk']} tok/chunk; vs bound x tok/chunk)",
        "vs_baseline": d["b1_spec_vs_bound"],
    })
    return out


def _serving_metrics():
    """PagedBatcher system benchmark: 7B GQA int8 serving under a
    saturating trace (more requests than slots, prompts prefilled while
    other slots decode).  Host-observed wall clock — includes the relay's
    per-dispatch overhead, so the sustained number UNDERSTATES on-prem
    throughput; it is the honest end-to-end figure on this box.

    Two operating points (production engines pick by SLO; r4 on-chip
    sweep in benchmarks/serving_trace.py):
      throughput-optimized (PRIMARY): 32 slots, admit_batch 4 — 909 tok/s
        at 1.52 s median TTFT when measured this round (48 slots reaches
        1069 at 2.33 s; diminishing);
      latency-optimized (budget-permitting): 16 slots — 666 tok/s at
        0.69 s median TTFT.

    Each trace runs in a SUBPROCESS (benchmarks/serving_trace.py): the
    32-slot config packs NF4 + int8 + 2.4 GB pools onto a nearly-full
    chip and reproducibly OOMs inside the bench process after the earlier
    sections' allocator churn (even with client-side live arrays at 0.12
    GB — the relay does not fully reclaim in-process), while a fresh
    process passes every time; the relay multiplexes clients, so a child
    process coexists with this one."""
    import json as _json
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "serving_trace.py")
    small = bool(os.environ.get("QLORA_BENCH_SMALL"))
    # spec pair: plain vs speculative on the SAME decode-dominant
    # reuse-heavy trace (motif prompts, 256 generated — the workload
    # speculation targets; r5 on-chip sweep: spec=3 1402 vs plain 968
    # tok/s = 1.45x at comparable TTFT; spec=7 loses, chunk cost outgrows
    # acceptance)
    tp_cfg, lat_cfg, plain_reuse_cfg, spec_cfg = (
        ("slots=32,n_req=48,admit_batch=4,spd=16,n_pages=288",
         "slots=16,n_req=24,admit_batch=4,spd=16,n_pages=256",
         "slots=32,n_req=32,admit_batch=4,spd=16,n_pages=288,reuse=1,new=256",
         "slots=32,n_req=32,admit_batch=4,spd=16,n_pages=288,spec=3,"
         "reuse=1,new=256")
        if not small else
        ("slots=2,n_req=4,admit_batch=2,spd=1,n_pages=32",
         "slots=2,n_req=3,admit_batch=2,spd=1,n_pages=32",
         "slots=2,n_req=4,admit_batch=2,spd=1,n_pages=32,reuse=1",
         "slots=2,n_req=4,admit_batch=2,spd=1,n_pages=32,spec=2,reuse=1"))

    def run_cfg(cfg_str):
        to = max(min(_remaining() - 20, 1500), 120)
        r = subprocess.run(
            [_sys.executable, script, cfg_str, "--json"],
            capture_output=True, text=True, timeout=to)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not lines:
            raise RuntimeError(
                f"serving trace subprocess rc={r.returncode}: "
                f"{(r.stderr or r.stdout)[-200:]}")
        return _json.loads(lines[-1])

    tp_label = "32-slot throughput config"
    try:
        d = run_cfg(tp_cfg)
    except Exception as e:  # noqa: BLE001
        _log(f"throughput-config trace failed ({str(e)[:120]}); "
             "falling back to the latency config as primary")
        d = run_cfg(lat_cfg)
        tp_label = "16-slot fallback (32-slot config failed this run)"
        lat_cfg = None
    # vs_baseline: decode weight-streaming ceiling discounted by the
    # trace's prefill share (serving_trace._ceilings — VERDICT r4 weak #6);
    # TTFT vs_baseline = unloaded admission latency / measured median
    out = [
        {
            "metric": "paged_batcher_tokens_per_s",
            "value": d["tok_s"],
            "unit": "tokens/s/chip (host-observed, incl. prefill; "
                    f"{tp_label}; ceiling {d['tok_s_ceiling']})",
            "vs_baseline": d["vs_tok_ceiling"],
        },
        {
            "metric": "paged_batcher_ttft_ms_median",
            "value": d["ttft_ms"],
            "unit": "ms (submit -> first token under saturating load; "
                    f"unloaded ideal {d['ttft_ideal_ms']})",
            "vs_baseline": d["vs_ttft_ideal"],
        },
    ]
    if _remaining() > 300:
        try:
            dp = run_cfg(plain_reuse_cfg)
            ds = run_cfg(spec_cfg)
            speedup = round(ds["tok_s"] / max(dp["tok_s"], 1e-9), 3)
            out += [
                {
                    "metric": "paged_batcher_tokens_per_s_spec",
                    "value": ds["tok_s"],
                    "unit": "tokens/s/chip (32-slot speculative draft-3, "
                            "reuse-heavy decode-dominant trace; "
                            f"{ds['tok_per_chunk']} tok/chunk, plain on "
                            f"same trace {dp['tok_s']}; ceiling "
                            f"{ds['tok_s_ceiling']})",
                    "vs_baseline": ds["vs_tok_ceiling"],
                },
                {
                    "metric": "paged_batcher_spec_speedup",
                    "value": speedup,
                    "unit": "x over the plain engine on the same trace "
                            f"(TTFT {ds['ttft_ms']} vs {dp['ttft_ms']} ms); "
                            "vs_baseline = speedup / measured tok-per-chunk "
                            "(1.0 = chunks as cheap as plain steps)",
                    "vs_baseline": round(
                        speedup / max(ds["tok_per_chunk"], 1e-9), 3),
                },
            ]
            if _remaining() > 300:
                # adaptive guard: spec_adaptive on the PRIMARY zero-reuse
                # trace (the worst case for prompt-lookup: fixed spec=3
                # measured 0.87x plain there).  The gate must hold the
                # engine at ~plain throughput — speculation becomes safe
                # to leave on for unknown traffic.  Ceiling is 1.0
                # (adaptive can at best match plain on hostile traffic).
                da = run_cfg(tp_cfg + ",spec=3,adaptive=1")
                guard = round(da["tok_s"] / max(d["tok_s"], 1e-9), 3)
                out.append({
                    "metric": "paged_batcher_spec_adaptive_guard",
                    "value": guard,
                    "unit": "adaptive-spec tok/s / plain tok/s on the "
                            "zero-reuse trace (fixed spec=3 loses ~13% "
                            "there; plain "
                            f"{d['tok_s']}, adaptive {da['tok_s']}, "
                            f"{da['spec_plain_dispatches']} demoted "
                            "dispatches)",
                    "vs_baseline": guard,
                })
            else:
                _log("skipping adaptive-guard trace: insufficient budget")
        except Exception as e:  # noqa: BLE001
            _log(f"spec serving trace failed: {str(e)[:160]}")
            out.append({"metric": "paged_batcher_spec_error", "value": 0,
                        "unit": str(e)[:120], "vs_baseline": 0.0})
    else:
        _log("skipping spec serving trace: insufficient budget")
    if lat_cfg is not None and _remaining() > 180:
        d2 = run_cfg(lat_cfg)
        out += [
            {
                "metric": "paged_batcher_tokens_per_s_latency_cfg",
                "value": d2["tok_s"],
                "unit": "tokens/s/chip (16-slot latency config; ceiling "
                        f"{d2['tok_s_ceiling']})",
                "vs_baseline": d2["vs_tok_ceiling"],
            },
            {
                "metric": "paged_batcher_ttft_ms_median_latency_cfg",
                "value": d2["ttft_ms"],
                "unit": "ms (submit -> first token, 16-slot config; "
                        f"unloaded ideal {d2['ttft_ideal_ms']})",
                "vs_baseline": d2["vs_ttft_ideal"],
            },
        ]
    else:
        _log("skipping latency-config serving trace: insufficient budget")
    return out


if __name__ == "__main__":
    main()
