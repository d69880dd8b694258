"""NF4-vs-bf16 LoRA finetuning parity — the QLoRA claim itself.

The reference's reason to exist is that 4-bit NF4 base weights preserve
16-bit finetuning task performance (reference README.md:18, the paper's
central result).  This test runs the SAME seed / SAME data / SAME base
weights through two LoRA finetunes — one with the base quantized to NF4,
one with the base in bf16 — at the largest in-env-feasible scale
(pythia-160m dims, random init, byte tokenizer; real 7B/65B validation is
weights/hardware-gated, recipe in PARITY.md §"Accuracy parity") and pins:

* both losses fall by > 40% (training works in both regimes),
* the tail-mean training-loss gap stays within 0.15 nats (measured 0.024
  at 12 steps / 0.016 at 24 steps on this config, on a ~7-nat drop —
  PARITY.md).

An MMLU-accuracy delta is deliberately NOT asserted here: on random-init
models a 24–48 sample MMLU slice is argmax noise (measured the same model
pair at Δ=0.0 and Δ=0.17 across runs, both chance-level), and mmlu_loss on
out-of-distribution input is unconstrained after 12 toy steps.  MMLU
parity is a real-weights experiment — recipe in PARITY.md.
"""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import get_config, init_lora_params, init_params
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step
from qlora_tpu.train.collator import CausalCollator
from qlora_tpu.train.data import extract_alpaca_example

from tests.test_data import FakeTokenizer

STEPS = 12


def _batches(tok):
    coll = CausalCollator(tok, source_max_len=48, target_max_len=16)
    texts = [
        ("Say apple.", "apple"), ("Name a fruit.", "banana pear"),
        ("Count to three.", "one two three"), ("Greet me.", "hello friend"),
        ("Say bye.", "goodbye now"), ("Echo cat.", "cat cat"),
    ]
    examples = [
        extract_alpaca_example(
            {"instruction": a, "input": "", "output": b}) for a, b in texts
    ]
    rng = np.random.default_rng(0)
    out = []
    for _ in range(STEPS):
        idx = rng.choice(len(examples), 4, replace=True)
        out.append({k: jnp.asarray(v)
                    for k, v in coll([examples[j] for j in idx]).items()})
    return out


def _finetune(cfg, lcfg, batches, quantized):
    # SAME PRNG keys: quantized=False yields the identical fp32 draw kept
    # in bf16; quantized=True quantizes that same draw to NF4
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=quantized)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 5e-3, total_steps=STEPS)
    state = init_train_state(lora, opt)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)
    losses = []
    for i, b in enumerate(batches):
        state, m = step(state, params, b, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    return losses, state, params


def test_nf4_matches_bf16_lora_finetune():
    cfg = get_config("EleutherAI/pythia-160m")
    lcfg = LoraConfig(r=8, alpha=16)
    tok = FakeTokenizer()
    batches = _batches(tok)

    l_nf4, st_nf4, p_nf4 = _finetune(cfg, lcfg, batches, quantized=True)
    l_bf16, st_bf16, p_bf16 = _finetune(cfg, lcfg, batches, quantized=False)

    assert all(np.isfinite(l_nf4)) and all(np.isfinite(l_bf16))
    # training works in BOTH regimes
    assert l_nf4[-1] < 0.6 * l_nf4[0], (l_nf4[0], l_nf4[-1])
    assert l_bf16[-1] < 0.6 * l_bf16[0], (l_bf16[0], l_bf16[-1])
    # the 4-bit run tracks the 16-bit run (tail-mean smooths single-batch
    # noise; measured gap 0.016 at 24 steps, bound 0.15 on a ~7-nat drop)
    tail = min(4, STEPS // 3)
    gap = abs(float(np.mean(l_nf4[-tail:])) - float(np.mean(l_bf16[-tail:])))
    assert gap < 0.15, (gap, l_nf4[-tail:], l_bf16[-tail:])
    # and the NF4 run tracks bf16 POINTWISE through the whole trajectory
    # (same batches, same seed: the curves differ only by quantization)
    ptwise = float(np.max(np.abs(np.asarray(l_nf4) - np.asarray(l_bf16))))
    assert ptwise < 0.5, (ptwise, l_nf4, l_bf16)
