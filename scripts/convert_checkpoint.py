"""Offline checkpoint conversion: HF fp16/bf16 → on-disk NF4 format.

The reference re-quantizes the base model from the hub on every start
(SURVEY.md §5: "the base model is never checkpointed").  For 65B-class
models that costs minutes of CPU per launch; this tool quantizes ONCE and
writes our packed format, which `load_quantized` then memory-maps straight
into device buffers.

Usage:
  python scripts/convert_checkpoint.py --src /path/to/hf-llama-7b \
      --dst /path/to/llama-7b-nf4 [--quant_type nf4] [--no-double-quant]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="HF checkpoint directory")
    ap.add_argument("--dst", required=True, help="output directory")
    ap.add_argument("--quant_type", default="nf4", choices=["nf4", "fp4"])
    ap.add_argument("--no-double-quant", action="store_true")
    args = ap.parse_args()

    from qlora_tpu.utils.hf_import import load_hf_model
    from qlora_tpu.utils.quantized_store import save_quantized

    t0 = time.time()
    params, cfg = load_hf_model(
        args.src, quantize_base=True, quant_type=args.quant_type,
        double_quant=not args.no_double_quant,
    )
    print(f"quantized in {time.time()-t0:.1f}s")
    save_quantized(args.dst, params, cfg)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
