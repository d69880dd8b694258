"""Tensor-parallel serving demo — decode a model too big for one chip.

Shards an NF4 model megatron-style over all available devices (head-parallel
attention, row-parallel projections, KV cache sharded over heads — see
qlora_tpu/parallel/tp_decode.py), prefills a batch of prompts, and greedy-
decodes.  On a v5e-4 slice this serves 65B NF4 (~33 GB packed) that cannot
fit one 16 GB chip; run with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=8 to try the sharding on a
virtual mesh.

Usage:
  python examples/serve_tp.py --model_path /path/to/hf-or-nf4-checkpoint \
      [--tp 4] [--prompt "..."] [--max_new_tokens 64]
  python examples/serve_tp.py --debug            # random tiny model, tp=2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon TPU plugin pins jax_platforms at import; honor an explicit
# JAX_PLATFORMS=cpu so the virtual-device mesh works (as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.transformer import init_cache
from qlora_tpu.parallel.tp_decode import (
    make_tp_forward_fn, make_tp_mesh, shard_decode_params, shard_tp_cache,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path")
    ap.add_argument("--tp", type=int, default=0, help="0 = all devices")
    ap.add_argument("--prompt", default="The three laws of robotics are")
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--debug", action="store_true",
                    help="random tiny model + byte tokenizer (no downloads)")
    args = ap.parse_args()

    tp = args.tp or len(jax.devices())
    lcfg = LoraConfig()

    if args.debug:
        from qlora_tpu.models import init_params
        from qlora_tpu.models.config import ModelConfig
        from qlora_tpu.utils.testing import FakeTokenizer

        cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=512,
                          intermediate_size=512, num_layers=2, num_heads=4,
                          num_kv_heads=4)
        params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
        tok = FakeTokenizer()
        tp = min(tp, 2)
    else:
        from qlora_tpu.utils.tokenizer import load_tokenizer

        if os.path.exists(os.path.join(args.model_path,
                                       "qlora_tpu_config.json")):
            from qlora_tpu.utils.quantized_store import load_quantized

            params, cfg = load_quantized(args.model_path)
        else:
            from qlora_tpu.utils.hf_import import load_hf_model

            params, cfg = load_hf_model(args.model_path, quantize_base=True)
        tok = load_tokenizer(args.model_path)

    mesh = make_tp_mesh(tp)
    print(f"devices: {len(jax.devices())}, tp={tp}; sharding params ...")
    params = shard_decode_params(params, mesh)
    fn = make_tp_forward_fn(cfg, lcfg, mesh, params, None)

    ids = [tok.bos_token_id] + tok.encode(args.prompt)
    S = len(ids)
    cap = S + args.max_new_tokens + 1
    cache = shard_tp_cache(init_cache(cfg, 1, cap), mesh)

    logits, cache = fn(params, None, jnp.asarray([ids], jnp.int32), cache)
    tok_id = int(jnp.argmax(logits[0, -1]))
    out = [tok_id]
    for _ in range(args.max_new_tokens - 1):
        logits, cache = fn(
            params, None, jnp.asarray([[tok_id]], jnp.int32), cache)
        tok_id = int(jnp.argmax(logits[0, 0]))
        if tok_id == getattr(tok, "eos_token_id", -1):
            break
        out.append(tok_id)
    print(args.prompt + tok.decode(out))


if __name__ == "__main__":
    main()
