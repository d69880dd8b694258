"""Single-stream (B=1) generate() decode: exact NF4 vs int8 serving copy
vs int8 + prompt-lookup speculation.

The reference's own inference surface (examples/guanaco_generate.py) is a
single prompt, single stream — and the reference's admitted weakness is
4-bit inference speed (README.md:135).  generate() runs the whole rollout
inside ONE jit'd while_loop dispatch, so (T2-T1)/(N2-N1) over two rollout
lengths isolates per-token device time from the relay's dispatch cost.

``--json`` emits one line for bench.py's b1 section:
  b1_int8_tok_s        vs_baseline = fraction of the int8 weight-streaming
                       bound (all serving-copy bytes incl. the int8
                       lm_head + the KV read, / HBM peak)
  b1_spec_tok_s        vs_baseline = fraction of bound × measured
                       tokens-per-chunk (the acceptance-determined
                       ceiling: each verify chunk reads the weights once
                       and retires tok_per_chunk tokens)

Run on the TPU chip:  python benchmarks/single_stream_decode.py [--json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qlora_tpu.utils.compile_cache import enable as _cc_enable

_cc_enable(jax)
import jax.numpy as jnp

from qlora_tpu.generate import generate
from qlora_tpu.models import init_params
from qlora_tpu.models.config import ModelConfig

HBM_PEAK_GBPS = 819.0      # TPU v5e


def rollout_time(params, cfg, n_new, tries=4, decode_impl=None, dec=None):
    ids = jnp.ones((1, 16), jnp.int32)
    lens = jnp.asarray([16], jnp.int32)

    def run():
        toks = generate(params, None, ids, lens, cfg, max_new_tokens=n_new,
                        eos_id=-1, decode_impl=decode_impl,
                        decode_params=dec, max_len=16 + 512)
        jax.block_until_ready(toks)
        # host materialization (relay resolves block_until_ready early)
        return int(jnp.sum(toks))

    run()   # compile
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def spec_rollout(params, cfg, dec, n1, n2, tries=4, draft_len=8):
    """Prompt-lookup speculation on the int8 path.  Acceptance is
    content-dependent; this trace measures whatever the model's own
    greedy rollout yields (random-init 7B rollouts typically fall into
    short loops, which prompt-lookup then rides)."""
    from qlora_tpu.generate.speculative import generate_speculative

    ids = jnp.ones((1, 16), jnp.int32)
    lens = jnp.asarray([16], jnp.int32)

    def run(n_new):
        toks, stats = generate_speculative(
            params, None, ids, lens, cfg, max_new_tokens=n_new,
            eos_id=-1, draft_len=draft_len, decode_impl="int8",
            decode_params=dec, max_len=16 + 512, with_stats=True)
        jax.block_until_ready(toks)
        return int(jnp.sum(toks)), stats["chunks"]

    run(n1)
    best1 = best2 = float("inf")
    c2 = 0
    for _ in range(tries):
        t0 = time.perf_counter()
        _, c1 = run(n1)
        best1 = min(best1, time.perf_counter() - t0)
    for _ in range(tries):
        t0 = time.perf_counter()
        _, c2 = run(n2)
        best2 = min(best2, time.perf_counter() - t0)
    per_tok = (best2 - best1) / (n2 - n1)
    tpc = (n2 - 1) / c2   # tokens per verify chunk (incl. the prefill token)
    print(f"decode_impl=int8 + speculation (draft_len={draft_len}): "
          f"{per_tok * 1e3:6.2f} ms/token  ({1.0 / per_tok:6.1f} tok/s)  "
          f"[{c2} chunks for {n2} tokens = {tpc:.2f} tok/chunk]",
          flush=True)
    return per_tok, tpc


def _b1_bound_tok_s(dec, cfg, kv_cap=528):
    """int8 weight-streaming speed-of-light at B=1: every serving-copy
    byte except the embed table (row-gathered, not streamed), plus the
    per-step KV read of the static cache (max_len=16+512 in this trace),
    over HBM peak."""
    p_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(
            {k: v for k, v in dec.items() if k != "embed"})
        if hasattr(x, "dtype"))
    kv_bytes = kv_cap * cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim * 2
    return (HBM_PEAK_GBPS * 1e9) / (p_bytes + kv_bytes)


def main():
    emit_json = "--json" in sys.argv
    print(f"backend: {jax.default_backend()}", flush=True)
    small = bool(os.environ.get("QLORA_BENCH_SMALL"))
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
    ) if not small else ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    n1, n2 = (32, 160) if not small else (8, 24)

    impls = ("int8",) if emit_json else (None, "int8")
    out = {}
    for impl in impls:
        dec = None
        if impl == "int8":
            from qlora_tpu.generate.serve_int8 import (
                requantize_params_int8_unstacked,
            )

            dec = requantize_params_int8_unstacked(params)
        t1 = rollout_time(params, cfg, n1, decode_impl=impl, dec=dec)
        t2 = rollout_time(params, cfg, n2, decode_impl=impl, dec=dec)
        per_tok = (t2 - t1) / (n2 - n1)
        print(f"decode_impl={impl}:  {per_tok * 1e3:6.2f} ms/token  "
              f"({1.0 / per_tok:6.1f} tok/s single-stream)", flush=True)

        if impl == "int8":
            bound = _b1_bound_tok_s(dec, cfg, kv_cap=16 + 512)
            out["b1_int8_tok_s"] = round(1.0 / per_tok, 1)
            out["b1_int8_vs_bound"] = round(1.0 / per_tok / bound, 3)
            spt, tpc = spec_rollout(params, cfg, dec, n1, n2)
            out["b1_spec_tok_s"] = round(1.0 / spt, 1)
            out["b1_tok_per_chunk"] = round(tpc, 2)
            # acceptance-determined ceiling: bound × tokens-per-chunk
            out["b1_spec_vs_bound"] = round(1.0 / spt / (bound * tpc), 3)
        del dec
        jax.clear_caches()
    if emit_json:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
