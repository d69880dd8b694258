"""Continuous-batching serving demo over the paged KV pool.

Reads prompts from a file (one per line) or stdin, serves them through
`PagedBatcher` with streaming per-token callbacks, and prints completions as
they finish — the minimal production-serving loop (admission + decode + page
recycling), without an HTTP layer.

Usage:
  python examples/serve_demo.py --model_path /path/to/hf-or-nf4-checkpoint \
      [--adapter_path ./output] [--prompts prompts.txt] \
      [--num_slots 8] [--max_new_tokens 128]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qlora_tpu.generate.paged import PagedBatcher
from qlora_tpu.generate.sampler import SamplingParams
from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params
from qlora_tpu.utils.checkpoint import get_last_checkpoint, load_checkpoint
from qlora_tpu.utils.tokenizer import load_tokenizer


def load_model(path):
    if os.path.exists(os.path.join(path, "qlora_tpu_config.json")):
        from qlora_tpu.utils.quantized_store import load_quantized

        return load_quantized(path)
    from qlora_tpu.utils.hf_import import load_hf_model

    return load_hf_model(path, quantize_base=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--adapter_path", default=None)
    ap.add_argument("--prompts", default=None, help="file of prompts (one/line)")
    ap.add_argument("--num_slots", type=int, default=128)
    ap.add_argument("--decode_impl", default=None,
                    choices=[None, "int8", "w8a8"],
                    help="int8: offline per-column int8 serving weights + "
                         "direct int8 MXU decode (~0.8x HBM SOL weight "
                         "reads, ~1.2%% rel err); default exact bf16")
    ap.add_argument("--prefill_impl", default=None, choices=[None, "w8a8"],
                    help="w8a8: in-kernel int8 prefill (~2x MXU rate at "
                         "bucket-size M, ~1.2%% rel err); default exact bf16")
    ap.add_argument("--n_pages", type=int, default=2048)
    ap.add_argument("--page_size", type=int, default=16)
    ap.add_argument("--max_pages_per_seq", type=int, default=64,
                    help="per-sequence token cap = max_pages_per_seq x "
                         "page_size (default 64 x 16 = 1024 tokens; "
                         "PagedBatcher's own default of 16 pages assumes "
                         "the bigger 64-token pages)")
    ap.add_argument("--max_new_tokens", type=int, default=128)
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="decode tokens generated per device dispatch "
                         "(multi-step scheduling: amortizes host/dispatch "
                         "overhead; admissions/EOS retire at burst "
                         "boundaries — single-chip serving only)")
    ap.add_argument("--admit_batch", type=int, default=1,
                    help="admissions prefilled per device dispatch (batched "
                         "admission: same-bucket prompts group into one "
                         "[admit_batch, bucket] prefill; short groups pad "
                         "with dummy rows — single-chip serving only)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel chips (>1: megatron-sharded "
                         "serving for models bigger than one chip; "
                         "composes with --decode_impl int8, excludes "
                         "w8a8/--prefill_impl)")
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top_p", type=float, default=0.9)
    args = ap.parse_args()

    params, cfg = load_model(args.model_path)
    tokenizer, _ = load_tokenizer(args.model_path)
    lcfg = LoraConfig()
    lora = None
    if args.adapter_path:
        ckpt, _ = get_last_checkpoint(args.adapter_path)
        like = init_lora_params(jax.random.PRNGKey(0), cfg, lcfg)
        lora, _, _ = load_checkpoint(ckpt or args.adapter_path, like)

    tp_mesh = None
    if args.tp > 1:
        # models bigger than one chip: megatron-shard over tp chips with
        # head-sharded page pools (parallel/tp_decode.py)
        from qlora_tpu.parallel.tp_decode import make_tp_mesh

        tp_mesh = make_tp_mesh(args.tp)

    batcher = PagedBatcher(
        params, lora, cfg, lcfg,
        num_slots=args.num_slots, n_pages=args.n_pages, decode_impl=args.decode_impl,
        prefill_impl=args.prefill_impl, page_size=args.page_size,
        max_pages_per_seq=args.max_pages_per_seq,
        eos_id=tokenizer.eos_token_id,
        sparams=SamplingParams(do_sample=True, temperature=args.temperature,
                               top_p=args.top_p),
        tp_mesh=tp_mesh,
        steps_per_dispatch=args.steps_per_dispatch,
        admit_batch=args.admit_batch,
    )

    if args.prompts:
        prompts = [l.strip() for l in open(args.prompts) if l.strip()]
    else:
        print("enter prompts (blank line to start serving):")
        prompts = []
        while (line := input("> ").strip()):
            prompts.append(line)

    reqs = {}
    for p in prompts:
        ids = [tokenizer.bos_token_id] + tokenizer.encode(p)
        r = batcher.submit(ids, max_new_tokens=args.max_new_tokens)
        reqs[r.uid] = p

    done = batcher.run_to_completion()
    for r in sorted(done, key=lambda r: r.uid):
        print(f"\n=== {reqs.get(r.uid, r.uid)} ===")
        print(tokenizer.decode(r.generated))


if __name__ == "__main__":
    main()
