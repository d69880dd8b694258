"""qlora_tpu — a TPU-native QLoRA framework (JAX / XLA / Pallas).

Brand-new implementation (not a port) of the capabilities of artidoro/qlora:
NF4 4-bit frozen base weights with double-quantized scales, fused Pallas
dequant+matmul linear layers, LoRA adapters, a jit training loop, an MMLU
evaluator, and a KV-cached generation engine — designed for GSPMD sharding
over TPU pod slices.

Top-level API (lazily imported to keep `import qlora_tpu` light):

    from qlora_tpu import quantize, dequantize          # NF4 core
    from qlora_tpu.models import get_config, forward    # model zoo
    from qlora_tpu.generate import generate             # inference
    from qlora_tpu.cli import main                      # finetune driver
"""

__version__ = "0.1.0"

_LAZY = {
    "quantize": ("qlora_tpu.quant", "quantize"),
    "dequantize": ("qlora_tpu.quant", "dequantize"),
    "QuantizedTensor": ("qlora_tpu.quant", "QuantizedTensor"),
    "qmatmul": ("qlora_tpu.ops", "qmatmul"),
    "LoraConfig": ("qlora_tpu.lora", "LoraConfig"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'qlora_tpu' has no attribute {name!r}")
