"""HF checkpoint importer: stream tensors → (optionally) NF4-quantize → pytree.

TPU-native replacement for transformers' bitsandbytes quantize-on-load
(SURVEY.md N4, reference call-site qlora.py:311-330): each weight shard is
read from safetensors (or a torch .bin), transposed to our [in, out]
convention, quantized per-tensor, and stacked per layer — the fp16 model is
never materialized in device memory at once.

Name maps cover the two reference families:
* LLaMA:   model.layers.{i}.self_attn.{q,k,v,o}_proj, mlp.{gate,up,down}_proj,
           {input,post_attention}_layernorm, model.norm, embed_tokens, lm_head
* GPT-NeoX: gpt_neox.layers.{i}.attention.{query_key_value,dense},
           mlp.dense_{h_to_4h,4h_to_h}, {input,post_attention}_layernorm,
           final_layer_norm, embed_in, embed_out
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import DenseLinear, QLinear
from qlora_tpu.quant.blockwise import quantize


def read_hf_config(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    mt = c.get("model_type")
    if mt in ("llama", "mistral", "qwen2", "gemma"):
        act = c.get("hidden_activation") or c.get("hidden_act", "silu")
        if act in ("gelu_pytorch_tanh", "gelu_new"):
            act = "gelu_tanh"
        return ModelConfig(
            arch="llama",
            vocab_size=c["vocab_size"],
            hidden_size=c["hidden_size"],
            intermediate_size=c["intermediate_size"],
            num_layers=c["num_hidden_layers"],
            num_heads=c["num_attention_heads"],
            num_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
            max_position_embeddings=c.get("max_position_embeddings", 2048),
            rope_theta=c.get("rope_theta", 10000.0),
            norm_eps=c.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=c.get("tie_word_embeddings", mt == "gemma"),
            hidden_act=act,
            sliding_window=c.get("sliding_window"),
            attention_bias=c.get("attention_bias", mt == "qwen2"),
            head_dim_override=c.get("head_dim"),
            norm_plus_one=(mt == "gemma"),
            scale_embeddings=(mt == "gemma"),
        )
    if mt == "gpt_neox":
        return ModelConfig(
            arch="neox",
            vocab_size=c["vocab_size"],
            hidden_size=c["hidden_size"],
            intermediate_size=c.get("intermediate_size", 4 * c["hidden_size"]),
            num_layers=c["num_hidden_layers"],
            num_heads=c["num_attention_heads"],
            num_kv_heads=c["num_attention_heads"],
            max_position_embeddings=c.get("max_position_embeddings", 2048),
            rope_theta=c.get("rotary_emb_base", 10000.0),
            norm_eps=c.get("layer_norm_eps", 1e-5),
            rotary_pct=c.get("rotary_pct", 0.25),
            use_parallel_residual=c.get("use_parallel_residual", True),
            use_bias=True,
            tie_word_embeddings=c.get("tie_word_embeddings", False),
            hidden_act=c.get("hidden_act", "gelu"),
        )
    raise ValueError(f"unsupported model_type {mt!r}")


def _tensor_reader(path: str) -> Callable[[str], np.ndarray]:
    """Returns get(name) -> np.ndarray streaming from safetensors or .bin."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        handles = [safe_open(f, framework="np") for f in st_files]
        index = {}
        for h in handles:
            for k in h.keys():
                index[k] = h

        def get(name: str) -> np.ndarray:
            t = index[name].get_tensor(name)
            if t.dtype == np.dtype("V2"):  # raw bf16 view
                t = t.view(np.uint16)
            return t

        get.names = set(index)  # type: ignore[attr-defined]
        return get

    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors or .bin weights under {path}")
    import torch

    state: dict = {}
    for f in bin_files:
        state.update(torch.load(f, map_location="cpu", weights_only=True))

    def get(name: str) -> np.ndarray:
        return state[name].to(torch.float32).numpy()

    get.names = set(state)  # type: ignore[attr-defined]
    return get


def _to_f32(arr: np.ndarray) -> jnp.ndarray:
    if arr.dtype == np.uint16:  # bf16 bit pattern
        return jnp.asarray(arr).view(jnp.bfloat16).astype(jnp.float32)
    return jnp.asarray(arr, dtype=jnp.float32)


def _import_linear(
    get, wname, bname, quantize_base, qkw, pad_in=0, pad_out=0
) -> QLinear | DenseLinear:
    w = _to_f32(get(wname)).T  # HF [out, in] → ours [in, out]
    bias = _to_f32(get(bname)) if bname and bname in get.names else None
    if pad_in or pad_out:
        w = jnp.pad(w, ((0, pad_in), (0, pad_out)))
        if bias is not None and pad_out:
            bias = jnp.pad(bias, (0, pad_out))
    if quantize_base:
        # large tensors: threaded native C++ quantizer (checkpoint-conversion
        # hot path); small ones aren't worth the host round-trip.  The C++
        # path packs 4-bit nibbles only — int8 (--bits 8) goes through jnp.
        if w.size >= 1 << 22 and qkw.get("quant_type") != "int8":
            from qlora_tpu.utils.native_quant import native_available, quantize_native

            if native_available():
                return QLinear(
                    qt=quantize_native(np.asarray(w), **qkw), bias=bias
                )
        return QLinear(qt=quantize(w, **qkw), bias=bias)
    return DenseLinear(w=w.astype(jnp.bfloat16), bias=bias)


def load_hf_model(
    path: str,
    cfg: Optional[ModelConfig] = None,
    *,
    quantize_base: bool = True,
    quant_type: str = "nf4",
    double_quant: bool = True,
    pad_intermediate_to: Optional[int] = None,
    pad_vocab_to: Optional[int] = None,
) -> tuple[dict, ModelConfig]:
    """Import an HF checkpoint directory into our param pytree.

    pad_intermediate_to: round the MLP intermediate dim up to a multiple of
    this (zero-padding weights — a mathematical no-op for SwiGLU/GELU MLPs)
    so shards satisfy N/(fsdp·tp) % 128 on the mesh (e.g. LLaMA's 11008 →
    11264 for 8-way model sharding).

    pad_vocab_to: round the vocab up to a multiple of this, zero-padding
    lm_head columns and embed rows so the head shards evenly on the mesh
    (e.g. LLaMA's 32000 → 32768 for 8-way tp × 128 lanes).  Exact:
    ``forward`` slices logits back to ``cfg.vocab_size``, so the pad ids
    never receive probability mass; pad embed rows are never looked up.
    cfg.vocab_size is left UNCHANGED — the padding is a storage detail.
    """
    import dataclasses as _dc

    import jax

    cfg = cfg or read_hf_config(path)
    pad_inter = 0
    if pad_intermediate_to:
        tgt = -(-cfg.intermediate_size // pad_intermediate_to) * pad_intermediate_to
        pad_inter = tgt - cfg.intermediate_size
        if pad_inter:
            cfg = _dc.replace(cfg, intermediate_size=tgt)
    get = _tensor_reader(path)
    qkw = {"quant_type": quant_type, "double_quant": double_quant}

    if cfg.arch == "llama":
        pre, blocks = "model.layers.", []
        lin_map = {
            "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
            "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
            "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
            "w_down": "mlp.down_proj",
        }
        inter_pad = {
            "w_gate": (0, pad_inter), "w_up": (0, pad_inter),
            "w_down": (pad_inter, 0),
        }
        for i in range(cfg.num_layers):
            b = {
                name: _import_linear(
                    get, f"{pre}{i}.{hf}.weight",
                    f"{pre}{i}.{hf}.bias" if cfg.attention_bias else None,
                    quantize_base, qkw, *inter_pad.get(name, (0, 0)),
                )
                for name, hf in lin_map.items()
            }
            b["attn_norm"] = _to_f32(get(f"{pre}{i}.input_layernorm.weight"))
            b["mlp_norm"] = _to_f32(get(f"{pre}{i}.post_attention_layernorm.weight"))
            blocks.append(b)
        embed = _to_f32(get("model.embed_tokens.weight"))
        final_norm = {"scale": _to_f32(get("model.norm.weight"))}
        head_name = "lm_head.weight"
        if cfg.tie_word_embeddings or head_name not in get.names:
            head_w = embed.T
        else:
            head_w = _to_f32(get(head_name)).T
    else:
        pre, blocks = "gpt_neox.layers.", []
        lin_map = {
            "w_qkv": "attention.query_key_value", "wo": "attention.dense",
            "w_fc": "mlp.dense_h_to_4h", "w_out": "mlp.dense_4h_to_h",
        }
        inter_pad = {"w_fc": (0, pad_inter), "w_out": (pad_inter, 0)}
        for i in range(cfg.num_layers):
            b = {
                name: _import_linear(
                    get, f"{pre}{i}.{hf}.weight", f"{pre}{i}.{hf}.bias",
                    quantize_base, qkw, *inter_pad.get(name, (0, 0)),
                )
                for name, hf in lin_map.items()
            }
            b["ln1"] = {
                "scale": _to_f32(get(f"{pre}{i}.input_layernorm.weight")),
                "bias": _to_f32(get(f"{pre}{i}.input_layernorm.bias")),
            }
            b["ln2"] = {
                "scale": _to_f32(get(f"{pre}{i}.post_attention_layernorm.weight")),
                "bias": _to_f32(get(f"{pre}{i}.post_attention_layernorm.bias")),
            }
            blocks.append(b)
        embed = _to_f32(get("gpt_neox.embed_in.weight"))
        final_norm = {
            "scale": _to_f32(get("gpt_neox.final_layer_norm.weight")),
            "bias": _to_f32(get("gpt_neox.final_layer_norm.bias")),
        }
        head_w = (
            embed.T if "embed_out.weight" not in get.names
            else _to_f32(get("embed_out.weight")).T
        )

    if pad_vocab_to:
        V = head_w.shape[1]
        pad_v = -(-V // pad_vocab_to) * pad_vocab_to - V
        if pad_v:
            head_w = jnp.pad(head_w, ((0, 0), (0, pad_v)))
            embed = jnp.pad(embed, ((0, pad_v), (0, 0)))

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "embed": embed.astype(jnp.bfloat16),
        "blocks": stacked,
        "final_norm": final_norm,
        "lm_head": DenseLinear(w=head_w.astype(jnp.bfloat16), bias=None),
    }
    return params, cfg
