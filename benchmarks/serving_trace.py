"""Serving-system trace experiments (run on the TPU chip).

Mirrors bench.py's _serving_metrics trace (7B GQA int8 decode, w8a8
prefill, 384-token prompts, 128 generated) but parameterized, to compare
scheduler configurations before promoting one into the bench headline:

  python benchmarks/serving_trace.py slots=16 n_req=24 admit_batch=1 \
      spd=16 n_pages=256

Each config is a fresh PagedBatcher (own int8 serving copy + pools);
pass several config strings to sweep sequentially in one process.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize forces the TPU plugin at import; honor an explicit
# CPU request (bench small mode, tests) the same way tests/conftest.py does
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)

import numpy as np

HBM_PEAK_GBPS = 819.0      # TPU v5e
MXU_BF16_TFLOPS = 197.0


def _ceilings(cfg, *, slots, n_req, admit_batch, spd, plen, new, bucket,
              page_size):
    """Physical ceilings for the trace (VERDICT r4 weak #6): the serving
    tok/s baseline is the decode weight-streaming ceiling adjusted for the
    prefill work the trace must also do, and the TTFT baseline is the
    unloaded admission latency (one group prefill + one decode-burst wait).

    decode step SOL  = int8 serving bytes (blocks + lm_head) + avg KV read
                       over HBM peak;
    prefill SOL      = 2·bucket·P_linear / bf16 MXU peak (prefill runs
                       w8a8 ≥ bf16 rate; bf16 keeps the bound conservative);
    tok/s ceiling    = total tokens / (decode-step time at full slots +
                       n_req prefills), i.e. slots/step_sol discounted by
                       the prefill share.
    """
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    KVH, hd = cfg.num_kv_heads, cfg.head_dim
    p_lin = (D * D * (2 + 2 * KVH / cfg.num_heads) + 3 * D * I) * L
    int8_bytes = p_lin + D * cfg.vocab_size          # blocks + int8 lm_head
    # per-step KV read: kernel fetches ceil(len/page) pages; average live
    # length over the trace ≈ plen + new/2
    avg_pages = -(-int(plen + new / 2) // page_size)
    kv_bytes = slots * avg_pages * page_size * L * 2 * KVH * hd * 2
    step_sol = (int8_bytes + kv_bytes) / (HBM_PEAK_GBPS * 1e9)
    prefill_sol = 2 * bucket * p_lin / (MXU_BF16_TFLOPS * 1e12)
    total_tokens = n_req * new
    wall_sol = (total_tokens / slots) * step_sol + n_req * prefill_sol
    tok_s_ceiling = total_tokens / wall_sol
    ttft_ideal = prefill_sol * admit_batch + spd * step_sol
    return tok_s_ceiling, ttft_ideal


def _make_prompt(rng, plen, vocab, reuse):
    """reuse=0: i.i.d. random tokens (worst case for prompt-lookup).
    reuse=1: a short random motif tiled to plen — the reuse-heavy regime
    (summarization/extraction/chat-with-context re-uses long spans); the
    model's continuation tends to continue the motif, so drafts accept."""
    if not reuse:
        return rng.integers(1, vocab, size=plen).tolist()
    motif = rng.integers(1, vocab, size=int(rng.integers(4, 9))).tolist()
    return (motif * (plen // len(motif) + 1))[:plen]


def run_config(params, cfg, *, slots, n_req, admit_batch, spd, n_pages,
               plen=384, new=128, page_size=64, bucket=512, small=False,
               emit_json=False, spec=0, reuse=0, adaptive=0):
    from qlora_tpu.generate.paged import PagedBatcher

    pb = PagedBatcher(
        params, None, cfg, num_slots=slots, n_pages=n_pages,
        page_size=page_size, max_pages_per_seq=12,
        prefill_buckets=(bucket,),
        eos_id=-1, decode_impl="int8" if not small else None,
        prefill_impl="w8a8" if not small else None,
        steps_per_dispatch=spd, admit_batch=admit_batch,
        spec_draft_len=spec, spec_adaptive=bool(adaptive),
    )
    rng = np.random.default_rng(0)
    t_first, t_submit = {}, {}

    def on_token(key):
        def cb(uid, tok):
            if key not in t_first:
                t_first[key] = time.perf_counter()
        return cb

    # warmup wave pays the compiles (incl. the admit_batch group program:
    # submit admit_batch+1 requests so both group shapes compile).  With
    # adaptive speculation the engine's FIRST dispatch is the plain-path
    # probe, so the warmup budget must span >= 2 decode dispatches or the
    # spec program's compile/cache-load lands mid-measurement.
    warm_new = 2 if not (spec and adaptive) else spd + 2
    for _ in range(max(admit_batch + 1, 2)):
        pb.submit(_make_prompt(rng, plen, cfg.vocab_size, reuse),
                  max_new_tokens=warm_new)
    pb.run_to_completion()

    t0 = time.perf_counter()
    reqs = []
    for i in range(n_req):
        prompt = _make_prompt(rng, plen, cfg.vocab_size, reuse)
        r = pb.submit(prompt, max_new_tokens=new, on_token=on_token(i))
        t_submit[i] = time.perf_counter()
        reqs.append(r)
    done = pb.run_to_completion()
    wall = time.perf_counter() - t0
    total = sum(len(r.generated) for r in reqs)
    ttfts = sorted(t_first[i] - t_submit[i] for i in t_first)
    med = ttfts[len(ttfts) // 2] if ttfts else 0.0
    assert len(done) == n_req
    adapt = ""
    if spec and adaptive:
        adapt = (f" adaptive(plain_dispatches={pb.spec_plain_dispatches},"
                 f" chunks={pb.spec_chunks})")
    print(f"slots={slots} n_req={n_req} ab={admit_batch} spd={spd} "
          f"pages={n_pages} spec={spec} reuse={reuse}:  "
          f"{total / wall:7.1f} tok/s   "
          f"median TTFT {med * 1e3:7.1f} ms   wall {wall:.2f} s{adapt}",
          flush=True)
    if emit_json:
        import json

        tok_ceil, ttft_ideal = _ceilings(
            cfg, slots=slots, n_req=n_req, admit_batch=admit_batch, spd=spd,
            plen=plen, new=new, bucket=bucket, page_size=page_size)
        tpc = 1.0
        if spec and pb.spec_chunks:
            # speculative ceiling: each verify chunk reads the weights once
            # and retires tpc tokens — the acceptance-determined multiple
            tpc = pb.spec_tokens / pb.spec_chunks
            tok_ceil *= tpc
        print(json.dumps({
            "slots": slots, "tok_s": round(total / wall, 1),
            "ttft_ms": round(med * 1e3, 1), "spec": spec,
            "reuse": reuse, "adaptive": adaptive,
            "spec_plain_dispatches": (pb.spec_plain_dispatches
                                      if spec and adaptive else 0),
            "tok_per_chunk": round(tpc, 2),
            "tok_s_ceiling": round(tok_ceil, 1),
            "ttft_ideal_ms": round(ttft_ideal * 1e3, 1),
            "vs_tok_ceiling": round(total / wall / tok_ceil, 3),
            "vs_ttft_ideal": round(ttft_ideal * 1e3 / max(med * 1e3, 1e-9),
                                   3),
        }), flush=True)
    del pb
    jax.clear_caches()


def main():
    from qlora_tpu.models import init_params
    from qlora_tpu.models.config import ModelConfig

    # QLORA_BENCH_SMALL: tiny model + tiny trace (bench.py smoke mode)
    small = bool(os.environ.get("QLORA_BENCH_SMALL"))
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8,
    ) if not small else ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)

    emit_json = "--json" in sys.argv
    extra = dict(small=True, plen=12, new=4, page_size=8,
                 bucket=16) if small else {}
    configs = []
    for arg in sys.argv[1:]:
        if arg.startswith("--"):
            continue
        kv = dict(p.split("=") for p in arg.split(","))
        configs.append({k: int(v) for k, v in kv.items()})
    if not configs:
        configs = [
            dict(slots=16, n_req=24, admit_batch=1, spd=16, n_pages=256),
            dict(slots=16, n_req=24, admit_batch=4, spd=16, n_pages=256),
            dict(slots=32, n_req=48, admit_batch=4, spd=16, n_pages=320),
        ]
    print(f"backend: {jax.default_backend()}", flush=True)
    for c in configs:
        run_config(params, cfg, emit_json=emit_json, **extra, **c)


if __name__ == "__main__":
    main()
