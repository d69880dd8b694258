"""The decoder-only transformer: LLaMA family + GPT-NeoX (pythia) family.

One unified functional implementation driven by ModelConfig flags (SwiGLU vs
GELU MLP, RMSNorm vs LayerNorm, parallel residual, partial rotary, biases,
GQA).  Layers are stacked and iterated with ``lax.scan`` (fast compiles,
remat-friendly); frozen base weights are NF4 ``QLinear``s computed through
the fused Pallas dequant-matmul, LoRA adapters ride on every block linear
(reference applies LoRA to all linear layers: qlora.py:248-259,385).

Param pytree layout (all block leaves stacked over the layer axis L):
  params = {
    "embed":      [V, D] bf16 (frozen),
    "blocks":     {...per-arch block dict of QLinear/DenseLinear/norm arrays},
    "final_norm": {"scale": [D], ("bias": [D])} f32,
    "lm_head":    DenseLinear [D, V] bf16 (frozen, never quantized — matches
                  transformers' bnb integration which skips lm_head),
  }
  lora = {"<linear name>": {"a": [L, K, r], "b": [L, r, N]} f32, ...}
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from qlora_tpu.lora import LoraConfig, apply_lora, init_lora
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.layers import (
    DenseLinear,
    QLinear,
    apply_linear,
    apply_rope,
    attention,
    attention_kvmajor,
    causal_mask,
    layer_norm,
    rms_norm,
    rope_frequencies,
)
from qlora_tpu.quant.blockwise import quantize

LLAMA_LINEARS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
NEOX_LINEARS = ("w_qkv", "wo", "w_fc", "w_out")


def linear_names(cfg: ModelConfig):
    return LLAMA_LINEARS if cfg.arch == "llama" else NEOX_LINEARS


def linear_dims(cfg: ModelConfig) -> dict:
    """name → (in_dim, out_dim) for each block linear."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.arch == "llama":
        return {
            "wq": (D, H * hd), "wk": (D, KVH * hd), "wv": (D, KVH * hd),
            "wo": (H * hd, D),
            "w_gate": (D, I), "w_up": (D, I), "w_down": (I, D),
        }
    return {
        "w_qkv": (D, 3 * D), "wo": (D, D),
        "w_fc": (D, I), "w_out": (I, D),
    }


# ---------------------------------------------------------------------------
# block forward
# ---------------------------------------------------------------------------


# stable per-linear ids so each adapter draws an independent dropout mask
# (peft draws per-module; round-1 passed one rng per block, correlating the
# same-shaped wq/wk/wv masks)
_LINEAR_RNG_IDS = {
    name: i for i, name in enumerate(sorted(set(LLAMA_LINEARS + NEOX_LINEARS)))
}


def _block_linear(block, lora, name, x, lcfg: LoraConfig, rng, tp_mode="auto"):
    y = apply_linear(block[name], x, tp_mode)
    if lora is not None and name in lora:
        sub = None
        if lcfg.dropout > 0 and rng is not None:
            sub = jax.random.fold_in(rng, _LINEAR_RNG_IDS[name])
        # megatron modes: for "column" the adapter's B is N-sharded (local
        # output); for "row_partial" its A is K-sharded (partial output) —
        # either way the shapes line up and the caller reduces once
        y = y + apply_lora(x, lora[name], lcfg.scale, lcfg.dropout, sub)
    # named for the selective-remat policy (remat="save_linear"): the NF4
    # dequant-matmuls run inside pallas calls, which the stock dot-output
    # policies (jax.checkpoint_policies.dots_*) never match — only named
    # residuals can keep them out of the remat re-forward
    return checkpoint_name(y, "linear_out")


def _megatron_axis():
    from qlora_tpu.models.layers import shard_ctx_axes

    tp_axis, _fsdp, style = shard_ctx_axes()
    return tp_axis if (style == "megatron" and tp_axis is not None) else None


def _nscale(cfg, scale):
    """RMSNorm weight as multiplied: gemma stores zero-centered (1 + w)."""
    return scale + 1.0 if cfg.norm_plus_one else scale


def _attn(cfg, block, lora, lcfg, x, cos, sin, mask, cache_kv, pos, rng,
          flash_lengths=None, sp_axis=None):
    """Attention sub-block. cache_kv: None or (k_buf, v_buf) [B, T, KVH, hd].

    flash_lengths: [B] valid-key lengths — when set (and no cache), attention
    runs through the Pallas flash kernel instead of the jnp path.
    sp_axis: sequence-parallel mesh axis — when set (inside shard_map with
    the sequence dim sharded), attention runs through the ring-attention
    collective (ops.ring_attention) so every query attends every key.
    """
    B, S, D = x.shape
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rotary_dim = int(cfg.rotary_pct * hd) // 2 * 2

    mega = _megatron_axis()
    col = "column" if mega else "auto"
    if mega:
        from qlora_tpu.models.layers import _ident_fwd_psum_bwd

        # ONE ident-fwd/psum-bwd per sub-block input (the three qkv
        # column-linears' partial input-cotangents sum locally first)
        x = _ident_fwd_psum_bwd(x, mega)

    if cfg.arch == "llama":
        # head counts derive from the (possibly head-sharded) weight shapes
        q = _block_linear(block, lora, "wq", x, lcfg, rng, col)
        k = _block_linear(block, lora, "wk", x, lcfg, rng, col)
        v = _block_linear(block, lora, "wv", x, lcfg, rng, col)
        q = q.reshape(B, S, -1, hd)
        k = k.reshape(B, S, -1, hd)
        v = v.reshape(B, S, -1, hd)
    else:
        qkv = _block_linear(block, lora, "w_qkv", x, lcfg, rng, col)
        # HF NeoX packs qkv per-head: [B, S, H, 3, hd]
        qkv = qkv.reshape(B, S, -1, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    q = apply_rope(q, cos, sin, rotary_dim)
    k = apply_rope(k, cos, sin, rotary_dim)

    if cache_kv is not None and len(cache_kv) == 3:
        k_pages, v_pages, tables = cache_kv       # [np,KVH,P,hd] ×2, [B,mp]
        if S == 1:
            # paged decode: ONE fused kernel appends the token into its
            # page in place (aliased pool) and attends over the sequence's
            # valid pages — no scatter, ≈length HBM traffic per step
            from qlora_tpu.ops.paged_attention import (
                fused_paged_decode_attention,
            )

            o, k_pages, v_pages = fused_paged_decode_attention(
                q[:, 0].astype(jnp.bfloat16), k[:, 0], v[:, 0],
                k_pages, v_pages, pos[:, 0], tables,
                sm_scale=1.0 / (hd ** 0.5),
                sliding_window=cfg.sliding_window,
            )
            attn_out = o[:, None]                 # [B, 1, H, hd]
        else:
            # speculative verify chunk: S = draft_len+1 tokens appended at
            # positions pos[:, 0].. and attended with in-chunk causality —
            # the PagedBatcher speculation path (generate/paged.py)
            from qlora_tpu.ops.paged_attention import (
                fused_paged_chunk_attention,
            )

            o, k_pages, v_pages = fused_paged_chunk_attention(
                q.astype(jnp.bfloat16), k, v,
                k_pages, v_pages, pos[:, 0], tables,
                sm_scale=1.0 / (hd ** 0.5),
                sliding_window=cfg.sliding_window,
            )
            attn_out = o                          # [B, S, H, hd]
        new_cache = (k_pages, v_pages, tables)
    elif cache_kv is not None:
        k_buf, v_buf = cache_kv                   # [B, KVH, T, hd]
        if S == 1:
            # decode: ONE fused kernel appends the token in place (aliased
            # cache) and runs masked online-softmax attention — replaces
            # the scatter + full-buffer jnp softmax that bound the decode
            # step at ~19 ms/step of glue (docs/DESIGN.md §6c)
            from qlora_tpu.ops.decode_attention import fused_decode_attention

            o, k_buf, v_buf = fused_decode_attention(
                q[:, 0].astype(jnp.bfloat16), k[:, 0], v[:, 0],
                k_buf, v_buf, pos[:, 0],
                sm_scale=1.0 / hd ** 0.5,
                sliding_window=cfg.sliding_window,
            )
            attn_out = o[:, None]                 # [B, 1, H, hd]
        else:
            # prefill into the cache: contiguous S-token update per row
            kt = jnp.transpose(k, (0, 2, 1, 3)).astype(k_buf.dtype)
            vt = jnp.transpose(v, (0, 2, 1, 3)).astype(v_buf.dtype)
            k_buf = jax.vmap(
                lambda buf, kk, p: jax.lax.dynamic_update_slice(
                    buf, kk, (0, p, 0))
            )(k_buf, kt, pos[:, 0])
            v_buf = jax.vmap(
                lambda buf, vv, p: jax.lax.dynamic_update_slice(
                    buf, vv, (0, p, 0))
            )(v_buf, vt, pos[:, 0])
            attn_out = attention_kvmajor(q, k_buf, v_buf, mask)
        new_cache = (k_buf, v_buf)
    elif sp_axis is not None:
        from qlora_tpu.ops.ring_attention import ring_attention

        qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, H, S, hd]
        kh = jnp.transpose(k, (0, 2, 1, 3))
        vh = jnp.transpose(v, (0, 2, 1, 3))
        if KVH != H:                          # GQA: repeat KV heads
            kh = jnp.repeat(kh, H // KVH, axis=1)
            vh = jnp.repeat(vh, H // KVH, axis=1)
        oh = ring_attention(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            vh.astype(jnp.bfloat16), axis_name=sp_axis,
            sm_scale=1.0 / (hd ** 0.5), causal=True,
        )
        attn_out = jnp.transpose(oh, (0, 2, 1, 3))
        new_cache = None
    elif flash_lengths is not None:
        from qlora_tpu.ops.flash_attention import flash_attention

        # GQA handled inside the kernel (kv index maps divide the head)
        qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, H, S, hd]
        kh = jnp.transpose(k, (0, 2, 1, 3))
        vh = jnp.transpose(v, (0, 2, 1, 3))
        oh = flash_attention(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            vh.astype(jnp.bfloat16), flash_lengths,
            1.0 / (hd ** 0.5), True, 256, 256, cfg.sliding_window,
        )
        attn_out = jnp.transpose(oh, (0, 2, 1, 3))
        new_cache = None
    else:
        attn_out = attention(q, k, v, mask)
        new_cache = None

    attn_out = attn_out.reshape(B, S, -1)  # [B, S, H_local * hd]
    # named residual: the S×S attention dots (flash pallas kernel) are the
    # other MXU-heavy output the save_linear remat policy keeps
    attn_out = checkpoint_name(attn_out, "attn_out")
    if mega:
        from qlora_tpu.models.layers import _psum_fwd_ident_bwd

        out = _block_linear(block, lora, "wo", attn_out, lcfg, rng,
                            "row_partial")
        out = _psum_fwd_ident_bwd(out, mega)
    else:
        out = _block_linear(block, lora, "wo", attn_out, lcfg, rng)
    return out, new_cache


def _mlp(cfg, block, lora, lcfg, x, rng):
    mega = _megatron_axis()
    col = "column" if mega else "auto"
    if mega:
        from qlora_tpu.models.layers import (
            _ident_fwd_psum_bwd, _psum_fwd_ident_bwd,
        )

        x = _ident_fwd_psum_bwd(x, mega)
    if cfg.arch == "llama":
        g = _block_linear(block, lora, "w_gate", x, lcfg, rng, col)
        u = _block_linear(block, lora, "w_up", x, lcfg, rng, col)
        # gated activation: SwiGLU (llama/mistral/qwen2) or GeGLU-tanh (gemma)
        act = (functools.partial(jax.nn.gelu, approximate=True)
               if cfg.hidden_act == "gelu_tanh" else jax.nn.silu)
        h = (act(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        if mega:
            out = _block_linear(block, lora, "w_down", h, lcfg, rng,
                                "row_partial")
            return _psum_fwd_ident_bwd(out, mega)
        return _block_linear(block, lora, "w_down", h, lcfg, rng)
    h = _block_linear(block, lora, "w_fc", x, lcfg, rng, col)
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(jnp.bfloat16)
    if mega:
        out = _block_linear(block, lora, "w_out", h, lcfg, rng, "row_partial")
        return _psum_fwd_ident_bwd(out, mega)
    return _block_linear(block, lora, "w_out", h, lcfg, rng)


def block_forward(cfg, lcfg, x, block, lora, cos, sin, mask, cache_kv, pos, rng,
                  flash_lengths=None, sp_axis=None):
    """One transformer block. Returns (x, new_cache_kv)."""
    if cfg.arch == "llama":
        h = rms_norm(x, _nscale(cfg, block["attn_norm"]), cfg.norm_eps)
        a, new_cache = _attn(cfg, block, lora, lcfg, h, cos, sin, mask, cache_kv,
                             pos, rng, flash_lengths, sp_axis)
        x = x + a
        h2 = rms_norm(x, _nscale(cfg, block["mlp_norm"]), cfg.norm_eps)
        x = x + _mlp(cfg, block, lora, lcfg, h2, rng)
    else:
        h1 = layer_norm(x, block["ln1"]["scale"], block["ln1"]["bias"], cfg.norm_eps)
        a, new_cache = _attn(cfg, block, lora, lcfg, h1, cos, sin, mask, cache_kv,
                             pos, rng, flash_lengths, sp_axis)
        if cfg.use_parallel_residual:
            h2 = layer_norm(x, block["ln2"]["scale"], block["ln2"]["bias"], cfg.norm_eps)
            x = x + a + _mlp(cfg, block, lora, lcfg, h2, rng)
        else:
            x = x + a
            h2 = layer_norm(x, block["ln2"]["scale"], block["ln2"]["bias"], cfg.norm_eps)
            x = x + _mlp(cfg, block, lora, lcfg, h2, rng)
    return x, new_cache


# ---------------------------------------------------------------------------
# full model forward
# ---------------------------------------------------------------------------


def _remat_wrap(body, remat):
    """Per-layer gradient checkpointing (reference default: qlora.py:206).

    remat=True/"full": save only layer boundaries — the backward pass
    re-runs each block's ENTIRE forward, including every NF4 dequant-
    matmul pallas kernel (minimum memory, the reference's behavior).

    remat="save_linear": save the named MXU-heavy outputs too
    ("linear_out" per block linear, "attn_out" per attention) so the
    re-forward recomputes only elementwise work (norms, rope, SwiGLU,
    residuals) — ~92 MB/layer extra residency at the 7B bench shape
    (B=2, S=512) for ~the remat re-forward's matmul share of step time.
    LoRA training leaves that HBM headroom at 7B; full finetuning and
    long-context shapes should keep "full"."""
    if not remat:
        return body
    if remat == "save_linear":
        policy = jax.checkpoint_policies.save_only_these_names(
            "linear_out", "attn_out")
        return jax.checkpoint(body, policy=policy)
    return jax.checkpoint(body)


def forward(
    params: dict,
    lora: Optional[dict],
    ids: jax.Array,                  # [B, S] int32
    cfg: ModelConfig,
    lcfg: LoraConfig = LoraConfig(),
    *,
    positions: Optional[jax.Array] = None,   # [B, S] (default arange)
    attn_mask: Optional[jax.Array] = None,   # [B, S] 1=real (right padding)
    cache: Optional[dict] = None,            # {"k","v": [L,B,T,KVH,hd], "length": [B]}
    rng: Optional[jax.Array] = None,
    remat: "bool | str" = False,   # False | True/"full" | "save_linear"
    use_flash: str = "auto",   # "auto" | "never" | "always"
    return_hidden: bool = False,
    sp_axis: Optional[str] = None,   # sequence-parallel shard_map axis
) -> tuple[jax.Array, Optional[dict]]:
    """Returns (logits [B, S, V] f32, updated cache or None); with
    ``return_hidden`` a third element: the post-final-norm hidden states
    [B, S, D] (HF last_hidden_state — contrastive search needs them)."""
    from qlora_tpu.models.layers import lookup_embedding

    B, S = ids.shape
    # under shard_map the embedding table may be feature-sharded over
    # (tp, fsdp); lookup_embedding reassembles full-D activations
    x = lookup_embedding(params["embed"], ids, jnp.bfloat16)
    if cfg.scale_embeddings:
        # gemma: hidden *= sqrt(hidden_size), normalizer cast to the compute
        # dtype first (matches HF GemmaModel exactly)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, jnp.bfloat16)

    if sp_axis is not None:
        # sequence-parallel training: this device holds a contiguous S-shard;
        # RoPE positions are global, causality is enforced inside
        # ring_attention (no local mask)
        assert cache is None, "sp_axis is a training/prefill-only path"
        offset = jax.lax.axis_index(sp_axis) * S
        positions = offset + jnp.arange(S)[None, :].repeat(B, 0)
    elif positions is None:
        if cache is not None:
            positions = cache["length"][:, None] + jnp.arange(S)[None, :]
        else:
            positions = jnp.arange(S)[None, :].repeat(B, 0)

    cos, sin = rope_frequencies(
        cfg.head_dim, int(cfg.rotary_pct * cfg.head_dim) // 2 * 2,
        cfg.rope_theta, positions,
    )

    paged = cache is not None and "k_pages" in cache
    if sp_axis is not None:
        mask = None  # ring attention enforces global causality itself
    elif paged:
        mask = None  # the paged kernel masks by length internally
    elif cache is not None:
        if S == 1:
            mask = None   # the fused decode kernel masks by length itself
        else:
            ck = cache["k"]
            # stacked [L, B, KVH, T, hd] or per-layer list of [B, KVH, T, hd]
            T = (ck[0].shape[2] if isinstance(ck, (list, tuple))
                 else ck.shape[3])
            kj = jnp.arange(T)[None, None, None, :]
            # keys valid if already written (< length) or written now (<= pos)
            mask = kj <= positions[:, None, :, None]
            if cfg.sliding_window:
                mask = mask & (
                    positions[:, None, :, None] - kj < cfg.sliding_window)
    else:
        T = S
        mask = causal_mask(S, S)
        if cfg.sliding_window:
            row = jnp.arange(S)[:, None]
            col = jnp.arange(S)[None, :]
            mask = mask & ((row - col) < cfg.sliding_window)[None, None]
        mask = jnp.broadcast_to(mask, (B, 1, S, S))
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    layer_rngs = jax.random.split(rng, cfg.num_layers)

    # flash kernel: training/prefill only, 128-aligned seq, lane-friendly head
    flash_ok = (
        cache is None
        and sp_axis is None
        and use_flash != "never"
        and S % 128 == 0
        and cfg.head_dim % 64 == 0
    )
    if use_flash == "always":
        flash_ok = cache is None and sp_axis is None
    flash_lengths = None
    if flash_ok:
        if attn_mask is not None:
            flash_lengths = attn_mask.astype(jnp.int32).sum(-1)
        else:
            flash_lengths = jnp.full((B,), S, jnp.int32)

    blk = functools.partial(block_forward, cfg, lcfg)
    tables = cache.get("tables") if paged else None

    def scan_body(x, per_layer):
        block, lora_l, cache_l, rng_l = per_layer
        if tables is not None:
            cache_l = (*cache_l, tables)  # per-seq page table, shared by layers
        xo, new_cache = blk(x, block, lora_l, cos, sin, mask, cache_l, positions,
                            rng_l, flash_lengths)
        if tables is not None:
            new_cache = new_cache[:2]
        return xo, new_cache

    body = _remat_wrap(scan_body, remat)

    if paged:
        cache_in = (cache["k_pages"], cache["v_pages"])
    elif cache is not None:
        cache_in = (cache["k"], cache["v"])
    else:
        cache_in = None
    # UNROLLED decode: when the blocks (and cache planes) arrive as
    # per-layer LISTS instead of L-stacked arrays, loop layers in python.
    # Rationale: lax.scan must dynamic-slice each layer's weights and cache
    # out of the stacked arrays and update-slice the cache back — and XLA
    # materializes those slices as real HBM copies around the opaque
    # pallas calls (~200 MB weights + 2×100 MB cache per layer at 7B:
    # measured as the dominant share of the decode step, r3's "19 ms of
    # dynamic-slice/bitcast glue").  Per-layer arrays are passed to their
    # kernels as whole buffers — no slicing, no copies.  utils for the
    # conversion: models.unstack (unstack_params / unstack_cache).
    unrolled = isinstance(params["blocks"], (list, tuple)) or (
        cache_in is not None and isinstance(cache_in[0], (list, tuple)))
    if cache_in is not None and unrolled:
        blocks = params["blocks"]
        blocks_listed = isinstance(blocks, (list, tuple))
        ks, vs = [], []
        for i in range(cfg.num_layers):
            # stacked blocks with a list cache still work (the per-layer
            # weight slices cost copies — pass unstacked params to avoid)
            block_i = (blocks[i] if blocks_listed else
                       jax.tree_util.tree_map(lambda a: a[i], blocks))
            if lora is None:
                lora_l = None
            elif isinstance(lora, (list, tuple)):
                lora_l = lora[i]
            else:   # stacked lora over unrolled blocks: slices are tiny
                lora_l = jax.tree_util.tree_map(lambda a: a[i], lora)
            cache_l = (cache_in[0][i], cache_in[1][i])
            if tables is not None:
                cache_l = (*cache_l, tables)
            x, nc_l = blk(x, block_i, lora_l, cos, sin, mask, cache_l,
                          positions, layer_rngs[i], flash_lengths)
            ks.append(nc_l[0])
            vs.append(nc_l[1])
        if paged:
            new_cache = {
                "k_pages": ks, "v_pages": vs,
                "tables": tables, "length": positions[:, -1] + 1,
            }
        else:
            new_cache = {
                "k": ks, "v": vs, "length": positions[:, -1] + 1,
            }
    elif cache_in is not None:
        x, cache_out = jax.lax.scan(
            body, x, (params["blocks"], lora, cache_in, layer_rngs)
        )
        if paged:
            new_cache = {
                "k_pages": cache_out[0], "v_pages": cache_out[1],
                "tables": tables, "length": positions[:, -1] + 1,
            }
        else:
            new_cache = {
                "k": cache_out[0], "v": cache_out[1],
                "length": positions[:, -1] + 1,
            }
    else:
        def body_nc(x, per_layer):
            block, lora_l, rng_l = per_layer
            xo, _ = blk(x, block, lora_l, cos, sin, mask, None, positions, rng_l,
                        flash_lengths, sp_axis)
            return xo, None
        body_nc = _remat_wrap(body_nc, remat)
        x, _ = jax.lax.scan(body_nc, x, (params["blocks"], lora, layer_rngs))
        new_cache = None

    if cfg.arch == "llama":
        x = rms_norm(x, _nscale(cfg, params["final_norm"]["scale"]),
                     cfg.norm_eps)
    else:
        x = layer_norm(
            x, params["final_norm"]["scale"], params["final_norm"]["bias"], cfg.norm_eps
        )
    logits = apply_linear(params["lm_head"], x).astype(jnp.float32)
    # mesh-divisible vocab: the importer may pad lm_head columns (and embed
    # rows) so V divides tp×fsdp×128; slice back so padded ids never receive
    # probability mass (exact — pad columns are zero-init but softmax'd)
    logits = logits[..., : cfg.vocab_size]
    if return_hidden:
        return logits, new_cache, x
    return logits, new_cache


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _init_linear(key, in_dim, out_dim, use_bias, quantized, dtype=jnp.bfloat16,
                 quant_type="nf4"):
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * (in_dim ** -0.5)
    bias = jnp.zeros((out_dim,), jnp.float32) if use_bias else None
    if quantized:
        return QLinear(qt=quantize(w, quant_type=quant_type), bias=bias)
    return DenseLinear(w=w.astype(dtype), bias=bias)


def init_params(
    key: jax.Array, cfg: ModelConfig, quantized: bool = True,
    quant_type: str = "nf4",
) -> dict:
    """Random-init model params (tests/benchmarks; real weights via hf_import)."""
    D = cfg.hidden_size
    keys = jax.random.split(key, 8)
    dims = linear_dims(cfg)

    def init_block(k):
        ks = jax.random.split(k, len(dims) + 1)
        block = {}
        for i, (name, (di, do)) in enumerate(sorted(dims.items())):
            has_bias = cfg.use_bias or (
                cfg.attention_bias and name in ("wq", "wk", "wv")
            )
            block[name] = _init_linear(ks[i], di, do, has_bias, quantized,
                                       quant_type=quant_type)
        if cfg.arch == "llama":
            block["attn_norm"] = jnp.ones((D,), jnp.float32)
            block["mlp_norm"] = jnp.ones((D,), jnp.float32)
        else:
            block["ln1"] = {"scale": jnp.ones((D,), jnp.float32),
                            "bias": jnp.zeros((D,), jnp.float32)}
            block["ln2"] = {"scale": jnp.ones((D,), jnp.float32),
                            "bias": jnp.zeros((D,), jnp.float32)}
        return block

    layer_keys = jax.random.split(keys[0], cfg.num_layers)
    blocks = [init_block(k) for k in layer_keys]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.arch == "llama":
        final_norm = {"scale": jnp.ones((D,), jnp.float32)}
    else:
        final_norm = {"scale": jnp.ones((D,), jnp.float32),
                      "bias": jnp.zeros((D,), jnp.float32)}

    embed = jax.random.normal(keys[1], (cfg.vocab_size, D), jnp.float32) * 0.02
    lm_head = DenseLinear(
        w=(embed.T if cfg.tie_word_embeddings
           else jax.random.normal(keys[2], (D, cfg.vocab_size), jnp.float32) * (D ** -0.5)
           ).astype(jnp.bfloat16),
        bias=None,
    )
    return {
        "embed": embed.astype(jnp.bfloat16),
        "blocks": blocks,
        "final_norm": final_norm,
        "lm_head": lm_head,
    }


def init_lora_params(key: jax.Array, cfg: ModelConfig, lcfg: LoraConfig) -> dict:
    """LoRA adapters for every block linear, stacked over layers."""
    dims = linear_dims(cfg)
    out = {}
    keys = jax.random.split(key, len(dims))
    for k, (name, (di, do)) in zip(keys, sorted(dims.items())):
        layer_keys = jax.random.split(k, cfg.num_layers)
        ads = [init_lora(lk, di, do, lcfg.r) for lk in layer_keys]
        out[name] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ads)
    return out


def init_cache(cfg: ModelConfig, batch: int, max_len: int) -> dict:
    """Fixed-size KV cache buffers, KV-HEAD MAJOR [L, B, KVH, T, hd]: each
    (batch, kv-head) stream is a contiguous [T, hd] slab, which is what the
    fused decode-attention kernel DMAs (ops/decode_attention.py)."""
    L, KVH, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    shape = (L, batch, KVH, max_len, hd)
    return {
        "k": jnp.zeros(shape, jnp.bfloat16),
        "v": jnp.zeros(shape, jnp.bfloat16),
        "length": jnp.zeros((batch,), jnp.int32),
    }
