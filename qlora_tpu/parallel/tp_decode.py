"""Tensor-parallel serving — decode models too big for one chip.

The BASELINE flagship serves a 65B NF4 model (~33 GB packed) on a v5e pod
slice; one 16 GB chip cannot hold it.  This module runs prefill/decode over
a ``("tp",)`` mesh with the SAME megatron sharding the training step uses
(parallel/megatron_step.py): head-parallel attention + row-parallel output
projections over K-sharded NF4 storage, so each forward pays two psums per
block (plus the lm_head column gather) and the fused Pallas kernels run
per-shard.  The KV cache shards over the head axis — per-chip cache memory
scales 1/tp, so batch × context scales with the slice.

Reference analog being replaced: ``device_map="auto"`` layer placement
(/root/reference/qlora.py:296-304), which ran layers SERIALLY across GPUs;
this runs every layer on all chips in parallel with Megatron collectives
riding ICI.

Constraints: num_heads and num_kv_heads divide tp; use
:func:`qlora_tpu.utils.hf_import.pad_vocab` (the importer does this) when
the vocab must divide tp×128 for the lm_head column shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import tp_shard_context
from qlora_tpu.parallel.megatron_step import (
    megatron_lora_specs,
    megatron_param_specs,
    requantize_row_parallel,
)

CACHE_SPECS = {
    "k": P(None, None, "tp", None, None),   # [L, B, KVH, T, hd] — head-sharded
    "v": P(None, None, "tp", None, None),
    "length": P(),
}

# per-LAYER pool entries [np, KVH, P, hd] (the pools are python lists of
# per-layer arrays; a P leaf acts as a tree prefix over the list)
PAGED_CACHE_SPECS = {
    "k_pages": P(None, "tp", None, None),
    "v_pages": P(None, "tp", None, None),
    "tables": P(),
    "length": P(),
}


def make_tp_mesh(tp: int) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:tp]).reshape(tp), ("tp",))


def shard_decode_params(params: dict, mesh: Mesh) -> dict:
    """Re-pack row-parallel linears for shard-local decode and place every
    tensor per the megatron specs (one pass at engine start-up)."""
    tp = mesh.shape["tp"]
    params = requantize_row_parallel(params, tp)
    specs = megatron_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )


def shard_tp_cache(cache: dict, mesh: Mesh) -> dict:
    """Place a (fresh or host-built) contiguous cache with head-sharding."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, CACHE_SPECS[k]))
        for k, v in cache.items()
    }


def shard_paged_cache(cache: dict, mesh: Mesh) -> dict:
    """Place a paged-pool cache dict with its page pools head-sharded."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, PAGED_CACHE_SPECS[k]))
        for k, v in cache.items()
    }


def make_tp_forward_fn(
    cfg: ModelConfig,
    lcfg: LoraConfig,
    mesh: Mesh,
    params_example: dict,
    lora_example: Optional[dict] = None,
    paged: bool = False,
    impl: Optional[str] = None,
):
    """Returns jit'd ``fn(params, lora, ids, cache) -> (logits, cache)``.

    Works for prefill (ids [B, S], positions from cache["length"]) and
    single-token decode (ids [B, 1]) alike — the same contiguous-cache
    forward the single-chip engines use, sharded head-wise.  With
    ``paged=True`` the cache is the paged-pool dict ({"k_pages", "v_pages",
    "tables", "length"}); S=1 runs the fused paged decode kernel and
    S>1 the fused paged CHUNK kernel (speculative verify) on each
    device's local heads.  ``impl="w8a8"`` routes QLinears through
    the int8 serving kernels (chunk-local per-column int8 weights — see
    generate/serve_int8.requantize_params_int8(row_parallel_k_shards=tp)).
    """
    tp = mesh.shape["tp"]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"heads ({cfg.num_heads}/{cfg.num_kv_heads}) must divide tp={tp}")
    import contextlib

    from qlora_tpu.models.transformer import forward
    from qlora_tpu.ops.qmatmul import default_impl

    pspecs = megatron_param_specs(params_example)
    lspecs = (None if lora_example is None
              else megatron_lora_specs(lora_example))
    cspecs = PAGED_CACHE_SPECS if paged else CACHE_SPECS

    def local(params, lora, ids, cache):
        ctx = default_impl(impl) if impl else contextlib.nullcontext()
        with tp_shard_context("tp", style="megatron"), ctx:
            logits, new_cache = forward(params, lora, ids, cfg, lcfg,
                                        cache=cache)
        return logits, new_cache

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, lspecs, P(), cspecs),
        out_specs=(P(), cspecs),
        check_rep=False,
    )
    return jax.jit(fn)
