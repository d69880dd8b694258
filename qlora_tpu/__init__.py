"""qlora_tpu — a TPU-native QLoRA framework (JAX / XLA / Pallas).

Brand-new implementation (not a port) of the capabilities of artidoro/qlora:
NF4 4-bit frozen base weights with double-quantized scales, fused Pallas
dequant+matmul linear layers, LoRA adapters, a jit training loop, an MMLU
evaluator, and a KV-cached generation engine — designed for GSPMD sharding
over TPU pod slices.
"""

__version__ = "0.1.0"
