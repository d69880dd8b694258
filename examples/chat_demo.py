"""Streaming multi-turn chat demo — terminal equivalent of the reference's
Gradio Colab notebook (examples/guanaco_7B_demo_colab.ipynb): multi-turn
history flattened to ``### Human:/### Assistant:`` turns, token streaming
(TextIteratorStreamer equivalent), stop-on-token criteria.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qlora_tpu.generate import SamplingParams, generate_stream
from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import init_lora_params
from qlora_tpu.utils.checkpoint import get_last_checkpoint, load_checkpoint
from qlora_tpu.utils.hf_import import load_hf_model
from qlora_tpu.utils.tokenizer import load_tokenizer


def build_prompt(history):
    """Flatten turns like the demo notebook's Gradio callback (cell 2)."""
    parts = []
    for user, assistant in history:
        parts.append(f"### Human: {user}### Assistant: {assistant}")
    return "".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--adapter_path", default=None)
    ap.add_argument("--max_new_tokens", type=int, default=512)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top_p", type=float, default=0.9)
    ap.add_argument("--decode_impl", default=None, choices=[None, "int8"],
                    help="int8: token loop through the direct int8 MXU "
                         "serving kernels (~3x decode at 7B; prefill "
                         "stays bf16-exact)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="prompt-lookup speculative decoding with K-token "
                         "drafts (0 = off): each device dispatch retires "
                         "1..K+1 tokens; sampled outputs stay exactly "
                         "distributed via rejection sampling")
    args = ap.parse_args()

    params, cfg = load_hf_model(args.model_path, quantize_base=True)
    tokenizer, _ = load_tokenizer(args.model_path)
    decode_params = None
    if args.decode_impl == "int8":
        # build the serving copy ONCE; reused across turns
        from qlora_tpu.generate.serve_int8 import (
            requantize_params_int8_unstacked,
        )

        decode_params = requantize_params_int8_unstacked(params)
    lcfg = LoraConfig()
    lora = None
    if args.adapter_path:
        ckpt, _ = get_last_checkpoint(args.adapter_path)
        like = init_lora_params(jax.random.PRNGKey(0), cfg, lcfg)
        lora, _, _ = load_checkpoint(ckpt or args.adapter_path, like)

    sp = SamplingParams(do_sample=True, temperature=args.temperature,
                        top_p=args.top_p)
    history = []
    print("Chat ready — empty line to quit.")
    while True:
        try:
            user = input("you> ").strip()
        except EOFError:
            break
        if not user:
            break
        history.append((user, ""))
        prompt = build_prompt(history)
        ids = [tokenizer.bos_token_id] + tokenizer.encode(prompt)
        reply_ids = []
        print("bot> ", end="", flush=True)
        if args.speculative > 0:
            from qlora_tpu.generate import generate_stream_speculative

            stream = generate_stream_speculative(
                params, lora, jnp.asarray([ids], jnp.int32),
                jnp.asarray([len(ids)]), cfg, lcfg,
                max_new_tokens=args.max_new_tokens,
                eos_id=tokenizer.eos_token_id, sparams=sp,
                draft_len=args.speculative,
                decode_impl=args.decode_impl, decode_params=decode_params,
            )
        else:
            stream = generate_stream(
                params, lora, jnp.asarray([ids], jnp.int32),
                jnp.asarray([len(ids)]), cfg, lcfg,
                max_new_tokens=args.max_new_tokens,
                eos_id=tokenizer.eos_token_id, sparams=sp,
                decode_impl=args.decode_impl, decode_params=decode_params,
            )
        for tok in stream:
            t = int(tok[0])
            if t == tokenizer.eos_token_id:
                break
            reply_ids.append(t)
            # stream decoded delta
            print(tokenizer.decode(reply_ids)[len(tokenizer.decode(reply_ids[:-1])):],
                  end="", flush=True)
        print()
        history[-1] = (user, tokenizer.decode(reply_ids))


if __name__ == "__main__":
    main()
