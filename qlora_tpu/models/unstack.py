"""Per-layer (unstacked) param/cache trees for the unrolled decode path.

Training and prefill iterate layers with ``lax.scan`` over L-stacked
arrays (fast compiles, remat-friendly).  Decode is different: the step is
memory-bound and tiny, and scan must dynamic-slice each layer's weights
and KV cache out of the stacked arrays — XLA materializes those slices as
real HBM copies around the opaque Pallas kernels (~200 MB weights +
2×100 MB cache per layer at 7B), which dominated the fused-kernel decode
step.  Serving engines therefore convert the trees ONCE at setup into
per-layer lists (`forward` detects lists and unrolls the layer loop), so
every kernel consumes whole buffers — no slicing, no copies.
"""

from __future__ import annotations

import jax


def _split(tree, n):
    """Stacked [L, ...] tree → list of n per-layer trees (one device slice
    each, paid once at setup)."""
    return [
        jax.tree_util.tree_map(lambda a: a[i], tree) for i in range(n)
    ]


def unstack_params(params: dict) -> dict:
    """params with ``blocks`` as a per-layer list (embed/final_norm/lm_head
    shared).  Idempotent."""
    blocks = params["blocks"]
    if isinstance(blocks, (list, tuple)):
        return params
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    return dict(params, blocks=_split(blocks, n))


def unstack_lora(lora, num_layers: int):
    """Stacked lora tree → per-layer list (or None passthrough)."""
    if lora is None or isinstance(lora, (list, tuple)):
        return lora
    return _split(lora, num_layers)


def unstack_cache(cache: dict) -> dict:
    """Contiguous or paged cache dict with per-layer plane lists."""
    out = dict(cache)
    for k in ("k", "v", "k_pages", "v_pages"):
        if k in cache and not isinstance(cache[k], (list, tuple)):
            out[k] = [cache[k][i] for i in range(cache[k].shape[0])]
    return out
