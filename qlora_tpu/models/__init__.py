"""Model zoo: LLaMA 1/2 + GPT-NeoX (pythia) decoders, functional style."""

from .config import ModelConfig, get_config, llama_config, neox_config, PRESETS
from .transformer import (
    forward,
    init_params,
    init_lora_params,
    init_cache,
    linear_dims,
    linear_names,
)
from .layers import QLinear, DenseLinear, apply_linear

__all__ = [
    "ModelConfig", "get_config", "llama_config", "neox_config", "PRESETS",
    "forward", "init_params", "init_lora_params", "init_cache",
    "linear_dims", "linear_names", "QLinear", "DenseLinear", "apply_linear",
]
