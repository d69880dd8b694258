"""HF importer parity: our forward vs transformers' torch forward.

Builds tiny random HF models (Llama + GPT-NeoX) on the fly, saves them,
imports with quantize_base=False (bf16 dense) and compares logits — an
end-to-end architecture-correctness oracle (RoPE convention, qkv packing,
norm placement, parallel residual, biases).  The NF4 path is then checked
for being close to the dense path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qlora_tpu.models import forward  # noqa: E402
from qlora_tpu.utils.hf_import import load_hf_model  # noqa: E402


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_llama")
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    model.save_pretrained(d)
    return str(d), model


@pytest.fixture(scope="module")
def tiny_neox(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_neox")
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=True, layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    model = transformers.GPTNeoXForCausalLM(cfg).eval()
    model.save_pretrained(d)
    return str(d), model


def _compare(path, hf_model, atol):
    params, cfg = load_hf_model(path, quantize_base=False)
    ids = np.array([[1, 5, 9, 2, 7, 3, 11, 4]], dtype=np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    ours, _ = forward(params, None, jnp.asarray(ids), cfg)
    ours = np.asarray(ours, np.float32)
    # compare softmax-invariant: logits up to bf16 error
    err = np.abs(ours - ref).max()
    assert err < atol, f"max logits err {err}"
    # argmax agreement up to tie-breaking: our argmax's reference logit must
    # be within tolerance of the reference max (random-init logits cluster,
    # so exact-argmax equality is noise)
    pick = np.take_along_axis(ref, ours.argmax(-1)[..., None], axis=-1)[..., 0]
    gap = ref.max(-1) - pick
    assert (gap < 2 * atol).all(), f"argmax gap {gap.max()}"


def test_llama_parity(tiny_llama):
    _compare(*tiny_llama, atol=0.15)


def test_neox_parity(tiny_neox):
    _compare(*tiny_neox, atol=0.15)


def test_quantized_close_to_dense(tiny_llama):
    path, _ = tiny_llama
    dense, cfg = load_hf_model(path, quantize_base=False)
    quant, _ = load_hf_model(path, quantize_base=True)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    ld, _ = forward(dense, None, ids, cfg)
    lq, _ = forward(quant, None, ids, cfg)
    ld, lq = np.asarray(ld, np.float32), np.asarray(lq, np.float32)
    # NF4 on random-init weights: logits shift but ranking mostly holds
    corr = np.corrcoef(ld.reshape(-1), lq.reshape(-1))[0, 1]
    assert corr > 0.98, corr


def test_pad_intermediate_is_noop(tiny_llama):
    path, hf_model = tiny_llama
    # 384 → 512 with pad_intermediate_to=256
    params, cfg = load_hf_model(path, quantize_base=False, pad_intermediate_to=256)
    assert cfg.intermediate_size == 512
    ids = np.array([[1, 5, 9, 2]], dtype=np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    ours, _ = forward(params, None, jnp.asarray(ids), cfg)
    assert np.abs(np.asarray(ours, np.float32) - ref).max() < 0.15


def test_pad_vocab_is_noop(tiny_llama):
    path, hf_model = tiny_llama
    # 256 → 384 with pad_vocab_to=128; cfg.vocab_size unchanged, logits
    # sliced back — bit-identical to the unpadded import
    params, cfg = load_hf_model(path, quantize_base=False, pad_vocab_to=384)
    assert cfg.vocab_size == 256
    assert params["lm_head"].w.shape[-1] == 384
    assert params["embed"].shape[0] == 384
    base, _ = load_hf_model(path, quantize_base=False)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    lp, _ = forward(params, None, ids, cfg)
    lb, _ = forward(base, None, ids, cfg)
    assert lp.shape[-1] == cfg.vocab_size
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lb))


@pytest.fixture(scope="module")
def tiny_mistral(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_mistral")
    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=8,
    )
    torch.manual_seed(2)
    model = transformers.MistralForCausalLM(cfg).eval()
    model.save_pretrained(d)
    return str(d), model


@pytest.fixture(scope="module")
def tiny_qwen2(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_qwen2")
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    model.save_pretrained(d)
    return str(d), model


def test_mistral_parity(tiny_mistral):
    _compare(*tiny_mistral, atol=0.2)


def test_qwen2_parity(tiny_qwen2):
    _compare(*tiny_qwen2, atol=0.2)


@pytest.fixture(scope="module")
def tiny_gemma(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_gemma")
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64,                     # ≠ hidden/heads: exercises override
        max_position_embeddings=128,
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(4)
    model = transformers.GemmaForCausalLM(cfg).eval()
    model.save_pretrained(d)
    return str(d), model


def test_gemma_parity(tiny_gemma):
    # (1+w) RMSNorm, GeGLU-tanh, sqrt(hidden) embed scaling, tied head,
    # explicit head_dim — all against transformers' reference forward
    _compare(*tiny_gemma, atol=0.2)
