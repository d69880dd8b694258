"""Group (diverse) beam search and contrastive search.

Completes the reference's generation surface (GenerationArguments
``num_beam_groups``/``diversity_penalty``/``penalty_alpha``,
/root/reference/qlora.py:230-240 via HF generate) with HF semantics:

* group beam search — beams split into G groups selected sequentially per
  step; later groups pay ``diversity_penalty`` × (times a token was chosen
  by earlier groups this step) on their log-probs (Hamming diversity).
* contrastive search — per step, the top-k probability candidates are
  scored ``(1−α)·p(tok) − α·max cos-sim(h_tok, previous hidden states)``
  and the best is taken (degeneration penalty over the model's
  post-final-norm hidden states).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward, init_cache

NEG = jnp.float32(-1e30)


# ---------------------------------------------------------------------------
# copy-on-write paged KV for beam search
# ---------------------------------------------------------------------------
#
# The contiguous beam cache reorders the FULL [L, B·k, max_len, KVH, hd]
# KV on every emitted token — O(context) HBM read+write traffic per step.
# The paged variant keeps KV in fixed-size pages with a per-beam page
# table:
#   * the prompt's full pages are written once and SHARED by all k beams
#     of a row (never rewritten — beams only append);
#   * completed generated pages are immutable, so a beam reorder just
#     gathers the page TABLE rows (a few hundred int32s);
#   * only the current PARTIAL page is copied per step (copy-on-write),
#     bounding the reorder traffic at page_size tokens instead of the
#     whole context — ~max_len/page_size less traffic per token.
# Page ids are assigned statically (lockstep decode: all beams of a row
# sit at the same position), so no allocator runs inside the jit:
#   page 0                      reserved (padding entries)
#   1 .. B·PB                   shared prompt pages (row-major)
#   W0 + r·W .. W0 + (r+1)·W    working pages of beam slot r (W rounds)


def _paged_beam_setup(params, lora, ids, lengths, cfg, lcfg, k, T, ps):
    """Prefill + build the shared-prompt paged cache for B·k beam slots.

    Returns (first_logits [B·k, V], cache dict, W0, W) where W0/W are the
    static working-page base/stride consumed by `_reorder_beams`.
    """
    from qlora_tpu.generate.engine import prefill

    B, S = ids.shape
    PB = -(-S // ps)                   # shared prompt pages per row
    Sp = PB * ps
    if Sp > S:
        ids = jnp.pad(ids, ((0, 0), (0, Sp - S)))
    cache = init_cache(cfg, B, Sp)
    last, cache = prefill(params, lora, ids, lengths, cfg, lcfg, cache=cache)
    cache, w0, w = _build_paged_beam_cache(
        cache["k"], cache["v"], lengths, k, T, ps)
    from qlora_tpu.models.unstack import unstack_cache

    return jnp.repeat(last, k, axis=0), unstack_cache(cache), w0, w


def _build_paged_beam_cache(kbuf, vbuf, lengths, k, T, ps):
    """Pool + page tables from prefilled contiguous KV [L, B, KVH, Sp, hd].

    Pure page plumbing (no model) — unit-testable against a contiguous
    simulation.  Returns (cache dict, W0, W)."""
    L, B, KVH, Sp, hd = kbuf.shape
    PB = Sp // ps
    R = B * k
    W = (T + ps - 1) // ps + 1         # working rounds (partial prompt + gen)
    W0 = 1 + B * PB
    n_pages = W0 + R * W
    k_pages = jnp.zeros((L, n_pages, KVH, ps, hd), kbuf.dtype)
    v_pages = jnp.zeros_like(k_pages)

    def to_pages(buf):                 # [L,B,KVH,Sp,hd] → [L,B·PB,KVH,ps,hd]
        p = buf.reshape(L, B, KVH, PB, ps, hd)
        return jnp.transpose(p, (0, 1, 3, 2, 4, 5)).reshape(
            L, B * PB, KVH, ps, hd)

    k_pages = k_pages.at[:, 1:W0].set(to_pages(kbuf))
    v_pages = v_pages.at[:, 1:W0].set(to_pages(vbuf))

    # each beam's first working page starts as the prompt REMAINDER
    # (positions fb·ps .. length-1; rows past length are masked by the
    # kernel, so the clamp-gathered filler is never attended)
    fb = lengths // ps                               # [B]
    idx = jnp.minimum(fb[:, None] * ps + jnp.arange(ps)[None, :], Sp - 1)

    def tail(buf):
        # [L, B, KVH, Sp, hd] gathered over Sp → [L, B, KVH, ps, hd]: a
        # page-major pool entry per row, repeated per beam → [L, R, ...]
        g = jnp.take_along_axis(buf, idx[None, :, None, :, None], axis=3)
        return jnp.repeat(g, k, axis=1)

    wp0 = W0 + jnp.arange(R) * W
    k_pages = k_pages.at[:, wp0].set(tail(kbuf))
    v_pages = v_pages.at[:, wp0].set(tail(vbuf))

    # page tables [R, PB + W]: shared prompt pages below fb, own working
    # pages for the next W blocks, padding (page 0) beyond
    MP = PB + W
    rows = jnp.arange(R)
    fb_r = jnp.repeat(fb, k)
    blocks = jnp.arange(MP)[None, :]
    shared = 1 + (rows[:, None] // k) * PB + blocks
    ownb = W0 + rows[:, None] * W + (blocks - fb_r[:, None])
    tables = jnp.where(
        blocks < fb_r[:, None], shared,
        jnp.where(blocks < (fb_r + W)[:, None], ownb, 0),
    ).astype(jnp.int32)
    cache = {"k_pages": k_pages, "v_pages": v_pages, "tables": tables,
             "length": jnp.repeat(lengths, k), "fb": fb_r}
    return cache, W0, W


def _reorder_beams(cache, gather_rows, paged_w0, paged_w):
    """Reorder the beam KV for the selected sources.

    Contiguous cache: gather the full KV (the O(context) path).  Paged
    cache: gather the page tables, COW-copy only the current partial page
    into each beam's own page, and re-point blocks ≥ current at the
    beam's own working pages (so future writes never collide)."""
    if paged_w0 is None:
        return {
            "k": [x[gather_rows] for x in cache["k"]],
            "v": [x[gather_rows] for x in cache["v"]],
            "length": cache["length"][gather_rows],
        }
    tables = cache["tables"][gather_rows]
    length = cache["length"]           # identical within a row: no gather
    fb = cache["fb"]
    R, MP = tables.shape
    ps = cache["k_pages"][0].shape[2]  # per-layer entry [np, KVH, ps, hd]
    c = length // ps                   # current (partial) block per slot
    rows = jnp.arange(R)
    own_cur = paged_w0 + rows * paged_w + (c - fb)
    src_cur = jnp.take_along_axis(tables, c[:, None], axis=1)[:, 0]
    kp = [x.at[own_cur].set(x[src_cur]) for x in cache["k_pages"]]
    vp = [x.at[own_cur].set(x[src_cur]) for x in cache["v_pages"]]
    blocks = jnp.arange(MP)[None, :]
    ownb = paged_w0 + rows[:, None] * paged_w + (blocks - fb[:, None])
    mine = (blocks >= c[:, None]) & (blocks < (fb + paged_w)[:, None])
    tables = jnp.where(mine, ownb, tables).astype(jnp.int32)
    return dict(cache, k_pages=kp, v_pages=vp, tables=tables)


_PAGED_KEYS = ("k_pages", "v_pages", "tables", "length")


# ---------------------------------------------------------------------------
# group (diverse) beam search
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "lcfg", "max_new_tokens", "eos_id", "num_beams",
                     "num_beam_groups", "diversity_penalty", "length_penalty",
                     "paged_w0", "paged_w"),
)
def _group_beam_loop(
    params, lora, first_logits, cache, *,
    cfg, lcfg, max_new_tokens, eos_id, num_beams, num_beam_groups,
    diversity_penalty, length_penalty, paged_w0=None, paged_w=None,
):
    """Diverse beam search with EOS-time hypothesis finalization.

    HF BeamSearchScorer semantics: each step takes 2·kg candidates per
    group; candidates that emit EOS are FINALIZED immediately (score
    length-normalized at that moment and banked), and the kg continuing
    beams are refilled from the non-EOS candidates, so finished beams never
    linger in the live set re-emitting EOS.  A group is done when its best
    banked hypothesis can no longer be beaten by any live beam
    (non-early-stopping heuristic).  Known divergence from HF: the
    normalization base is the GENERATED length (t+1 tokens incl. the EOS),
    not HF's full-sequence length (prompt + generated) — with a shared
    prompt length this is a monotone transform at fixed t but weighs
    length_penalty≠1.0 slightly differently.
    """
    Bk = first_logits.shape[0]
    k = num_beams
    B = Bk // k
    G = num_beam_groups
    kg = k // G
    V = cfg.vocab_size
    T = max_new_tokens
    n_cand = min(2 * kg, kg * V)   # ≥ kg non-EOS survive (≤ kg can be EOS)

    def step(state):
        t, logits, cache, scores, gdone, fin_sc, fin_out, out = state
        logp_all = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(B, k, V)
        tf = (t + 1).astype(jnp.float32)          # generated length incl. eos

        counts = jnp.zeros((B, V), jnp.float32)   # tokens chosen this step
        toks = jnp.zeros((B, k), jnp.int32)
        srcs = jnp.zeros((B, k), jnp.int32)
        new_scores = jnp.zeros((B, k), jnp.float32)
        rows = jnp.arange(B)
        for g in range(G):                        # static loop: groups in order
            sl = slice(g * kg, (g + 1) * kg)
            lp = logp_all[:, sl]
            if diversity_penalty > 0.0 and g > 0:
                lp = lp - diversity_penalty * counts[:, None, :]
            total = scores[:, sl, None] + lp      # [B, kg, V]
            sc2, idx2 = jax.lax.top_k(total.reshape(B, kg * V), n_cand)
            src2 = g * kg + idx2 // V             # beams stay inside the group
            tok2 = idx2 % V
            is_eos = tok2 == eos_id

            # finalize the best EOS candidate this step (running max over
            # steps ⇒ overall best finished hypothesis per group); done
            # groups stop banking, matching HF's `if beam_hyps.is_done`
            cand = jnp.where(is_eos, sc2 / tf ** length_penalty, -jnp.inf)
            bc = jnp.argmax(cand, axis=1)                       # [B]
            bsc = jnp.where(gdone[:, g], -jnp.inf, cand[rows, bc])
            cand_out = out[rows, src2[rows, bc]].at[:, t].set(eos_id)
            better = bsc > fin_sc[:, g]
            fin_out = fin_out.at[:, g].set(
                jnp.where(better[:, None], cand_out, fin_out[:, g]))
            fin_sc = fin_sc.at[:, g].set(jnp.where(better, bsc, fin_sc[:, g]))

            # continuing beams: best kg non-EOS candidates
            sc_cont = jnp.where(is_eos, NEG, sc2)
            sc_g, pick = jax.lax.top_k(sc_cont, kg)             # [B, kg]
            tok_g = jnp.take_along_axis(tok2, pick, axis=1)
            src_g = jnp.take_along_axis(src2, pick, axis=1)
            counts = counts + jax.nn.one_hot(tok_g, V, dtype=jnp.float32).sum(1)
            toks = toks.at[:, sl].set(tok_g)
            srcs = srcs.at[:, sl].set(src_g)
            new_scores = new_scores.at[:, sl].set(sc_g)

            # non-early-stopping done check: live scores only decrease and
            # (for length_penalty ≥ 0) the normalizer only grows, so the
            # best attainable future hypothesis is max(live)/tf^lp
            attain = jnp.max(sc_g, axis=1) / (
                tf ** length_penalty if length_penalty >= 0.0
                else jnp.float32(T) ** length_penalty)
            gdone = gdone.at[:, g].set(gdone[:, g] | (fin_sc[:, g] >= attain))

        gather_rows = (rows[:, None] * k + srcs).reshape(-1)
        cache = _reorder_beams(cache, gather_rows, paged_w0, paged_w)
        out = out[rows[:, None], srcs]
        out = out.at[:, :, t].set(toks)
        fwd_cache = ({q: cache[q] for q in _PAGED_KEYS}
                     if paged_w0 is not None else cache)
        new_logits, fwd_cache = forward(
            params, lora, toks.reshape(-1)[:, None], cfg, lcfg,
            cache=fwd_cache,
        )
        cache = (dict(fwd_cache, fb=cache["fb"])
                 if paged_w0 is not None else fwd_cache)
        return (t + 1, new_logits[:, 0], cache, new_scores, gdone, fin_sc,
                fin_out, out)

    def cond(state):
        t = state[0]
        gdone = state[4]
        return (t < T) & ~jnp.all(gdone)

    out = jnp.full((B, k, T), eos_id, jnp.int32)
    # one live beam per group at t=0 (all groups share the same prefix)
    init = jnp.full((k,), NEG).at[jnp.arange(0, k, kg)].set(0.0)
    scores = jnp.tile(init[None, :], (B, 1)).astype(jnp.float32)
    state = (jnp.int32(0), first_logits, cache, scores,
             jnp.zeros((B, G), bool),
             jnp.full((B, G), -jnp.inf, jnp.float32),
             jnp.full((B, G, T), eos_id, jnp.int32), out)
    _, _, _, scores, _, fin_sc, fin_out, out = jax.lax.while_loop(
        cond, step, state)

    # groups with no finished hypothesis fall back to their best live beam,
    # normalized by its generated length
    lengths = jnp.sum(out != eos_id, axis=-1).astype(jnp.float32) + 1.0
    norm = (scores / (lengths ** length_penalty)).reshape(B, G, kg)
    live_best = jnp.argmax(norm, axis=2)                        # [B, G]
    rows = jnp.arange(B)[:, None]
    live_sc = jnp.take_along_axis(norm, live_best[..., None], 2)[..., 0]
    live_out = out.reshape(B, G, kg, T)[rows, jnp.arange(G)[None, :],
                                        live_best]              # [B, G, T]
    use_fin = fin_sc > live_sc
    g_sc = jnp.where(use_fin, fin_sc, live_sc)                  # [B, G]
    g_out = jnp.where(use_fin[..., None], fin_out, live_out)    # [B, G, T]
    best_g = jnp.argmax(g_sc, axis=1)
    return g_out[jnp.arange(B), best_g]


def group_beam_search(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens=256, eos_id=2, num_beams=4, num_beam_groups=2,
    diversity_penalty: float = 0.0, length_penalty: float = 1.0,
    max_len=None, paged_kv: bool = True, page_size: int = 16,
):
    """Diverse beam search (HF ``num_beam_groups`` semantics).

    ``paged_kv=True`` (default) runs beams on the copy-on-write paged KV:
    prompt pages shared across beams, reorders move page-table rows plus
    one partial page instead of the whole context.  ``paged_kv=False``
    keeps the contiguous cache (reference semantics oracle for tests)."""
    from qlora_tpu.generate.engine import prefill

    if num_beams % num_beam_groups != 0:
        raise ValueError("num_beams must be divisible by num_beam_groups")
    B, S = ids.shape
    k = num_beams
    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )

    if paged_kv:
        first, cache, w0, w = _paged_beam_setup(
            params, lora, ids, lengths, cfg, lcfg, k, max_new_tokens,
            page_size)
    else:
        max_len = max_len or (S + max_new_tokens)
        cache = init_cache(cfg, B, max_len)
        last, cache = prefill(params, lora, ids, lengths, cfg, lcfg,
                              cache=cache)
        cache = {
            "k": jnp.repeat(cache["k"], k, axis=1),
            "v": jnp.repeat(cache["v"], k, axis=1),
            "length": jnp.repeat(cache["length"], k),
        }
        first = jnp.repeat(last, k, axis=0)
        w0 = w = None
        cache = unstack_cache(cache)  # paged branch arrives pre-unstacked
    # per-layer trees: the decode loop runs copy-free unrolled layers
    params = unstack_params(params)
    lora = unstack_lora(lora, cfg.num_layers)
    return _group_beam_loop(
        params, lora, first, cache, cfg=cfg, lcfg=lcfg,
        max_new_tokens=max_new_tokens, eos_id=eos_id, num_beams=k,
        num_beam_groups=num_beam_groups,
        diversity_penalty=float(diversity_penalty),
        length_penalty=float(length_penalty), paged_w0=w0, paged_w=w,
    )


# ---------------------------------------------------------------------------
# contrastive search
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "lcfg", "max_new_tokens", "eos_id", "top_k",
                     "penalty_alpha"),
)
def _contrastive_loop(
    params, lora, first_logits, cache, hist, hist_len, *,
    cfg, lcfg, max_new_tokens, eos_id, top_k, penalty_alpha,
):
    B, V = first_logits.shape
    k = top_k
    D = hist.shape[-1]
    Tmax = hist.shape[1]
    alpha = jnp.float32(penalty_alpha)

    def step(state):
        t, logits, cache, hist, done, out = state
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        p_c, tok_c = jax.lax.top_k(probs, k)            # [B, k]

        # run the k candidates against k copies of the cache (per-layer
        # list entries [B, KVH, T, hd]: batch is axis 0)
        cache_x = {
            "k": [jnp.repeat(x, k, axis=0) for x in cache["k"]],
            "v": [jnp.repeat(x, k, axis=0) for x in cache["v"]],
            "length": jnp.repeat(cache["length"], k),
        }
        lg, cache_x, h = forward(
            params, lora, tok_c.reshape(-1)[:, None], cfg, lcfg,
            cache=cache_x, return_hidden=True,
        )
        h = h[:, 0].astype(jnp.float32).reshape(B, k, D)
        hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6)

        n_hist = hist_len + t                            # prompt + generated
        sim = jnp.einsum("bkd,btd->bkt", hn, hist)       # hist rows normalized
        valid = jnp.arange(Tmax)[None, None, :] < n_hist[:, None, None]
        max_sim = jnp.max(jnp.where(valid, sim, -1.0), axis=-1)  # [B, k]

        score = (1.0 - alpha) * p_c - alpha * max_sim
        best = jnp.argmax(score, axis=1)                 # [B]
        rows = jnp.arange(B) * k + best
        tok = tok_c[jnp.arange(B), best]
        tok = jnp.where(done, eos_id, tok)

        cache = {
            "k": [x[rows] for x in cache_x["k"]],
            "v": [x[rows] for x in cache_x["v"]],
            "length": cache_x["length"][rows],
        }
        hist = hist.at[jnp.arange(B), n_hist].set(
            hn[jnp.arange(B), best]
        )
        out = out.at[:, t].set(tok)
        done = done | (tok == eos_id)
        logits = lg[:, 0].reshape(B, k, V)[jnp.arange(B), best]
        return (t + 1, logits, cache, hist, done, out)

    def cond(state):
        t, _, _, _, done, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    out = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    state = (jnp.int32(0), first_logits, cache, hist,
             jnp.zeros((B,), bool), out)

    def body(state):
        t, logits, cache, hist, done, out = step(state)
        return (t, logits, cache, hist, done, out)

    state = jax.lax.while_loop(cond, body, state)
    return state[5]


def contrastive_search(
    params, lora, ids, lengths, cfg, lcfg=LoraConfig(), *,
    max_new_tokens=256, eos_id=2, top_k=4, penalty_alpha=0.6, max_len=None,
):
    """HF contrastive search (``penalty_alpha`` + ``top_k``)."""
    B, S = ids.shape
    max_len = max_len or (S + max_new_tokens)
    cache = init_cache(cfg, B, max_len)
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    logits, cache, h = forward(
        params, lora, ids, cfg, lcfg, cache=cache, positions=positions,
        return_hidden=True,
    )
    cache = dict(cache, length=lengths)
    last = jnp.take_along_axis(logits, (lengths - 1)[:, None, None], axis=1)[:, 0]

    # history buffer of normalized hidden states (prompt rows beyond length
    # are masked out by hist_len in the loop)
    D = h.shape[-1]
    hf32 = h.astype(jnp.float32)
    hn = hf32 / jnp.maximum(jnp.linalg.norm(hf32, axis=-1, keepdims=True), 1e-6)
    hist = jnp.zeros((B, max_len + max_new_tokens, D), jnp.float32)
    hist = hist.at[:, :S].set(hn)

    # note: hist_len advances by one per generated token; passed as the
    # running insert position (starts at prompt length)
    from qlora_tpu.models.unstack import (
        unstack_cache, unstack_lora, unstack_params,
    )

    params = unstack_params(params)
    lora = unstack_lora(lora, cfg.num_layers)
    cache = unstack_cache(cache)
    return _contrastive_loop(
        params, lora, last, cache, hist, lengths,
        cfg=cfg, lcfg=lcfg, max_new_tokens=max_new_tokens, eos_id=eos_id,
        top_k=int(top_k), penalty_alpha=float(penalty_alpha),
    )
