"""BASELINE.json config 1: pythia-160m NF4+LoRA — quantize, 10 Alpaca
finetune steps with falling loss, greedy decode. CPU-runnable (real model
dims, random weights, byte tokenizer)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qlora_tpu.generate import generate
from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import forward, get_config, init_lora_params, init_params
from qlora_tpu.train import init_train_state, make_optimizer, make_train_step
from qlora_tpu.train.collator import CausalCollator
from qlora_tpu.train.data import extract_alpaca_example

from tests.test_data import FakeTokenizer


@pytest.mark.parametrize("quant_type", ["nf4"])
def test_pythia160m_nf4_lora_smoke(quant_type):
    cfg = get_config("EleutherAI/pythia-160m")
    assert cfg.hidden_size == 768 and cfg.num_layers == 12

    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lcfg = LoraConfig(r=8, alpha=16)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)

    # alpaca-formatted batch through the real collator
    tok = FakeTokenizer()
    coll = CausalCollator(tok, source_max_len=48, target_max_len=16)
    examples = [
        extract_alpaca_example(
            {"instruction": "Say apple.", "input": "", "output": "apple"}
        )
        for _ in range(4)
    ]
    batch = {k: jnp.asarray(v) for k, v in coll(examples).items()}

    opt = make_optimizer("paged_adamw_32bit", 5e-3, total_steps=10)
    state = init_train_state(lora, opt)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False)

    losses = []
    for i in range(10):
        state, m = step(state, params, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    # greedy decode with the trained adapters
    prompt = [tok.bos_token_id] + tok.encode("Say apple.")
    toks = generate(
        params, state.trainable, jnp.asarray([prompt], jnp.int32),
        jnp.asarray([len(prompt)]), cfg, lcfg,
        max_new_tokens=8, eos_id=tok.eos_token_id,
    )
    assert toks.shape == (1, 8)
    assert np.isfinite(np.asarray(toks)).all()
