"""Paged KV cache pool — vLLM-style page allocation for serving.

One physical pool of KV pages shared by all in-flight sequences; each
sequence owns a page table mapping logical blocks to scattered pages.  The
decode path consumes this through ``forward(cache={"k_pages", "v_pages",
"tables", "length"})`` (models.transformer paged branch → ops.paged_attention
kernel).

Host-side allocator (free-list) + device pools.  Prefill writes a prompt's
contiguous KV into its allocated pages with one scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qlora_tpu.models.config import ModelConfig


class PoolExhausted(MemoryError):
    """The shared page pool has no free page (recoverable: the batcher
    preempts the youngest sequence and retries).  Distinct from the plain
    MemoryError raised when one sequence exceeds max_pages_per_seq —
    preemption cannot fix a per-sequence capacity violation."""


class PagedPool:
    """Physical page pool + free-list allocator."""

    def __init__(self, cfg: ModelConfig, n_pages: int, page_size: int = 64,
                 max_pages_per_seq: int = 16):
        # page_size 64 (vs vLLM's GPU-style 16): the TPU kernel's transfer
        # unit is a whole page for all kv heads, and HBM DMA efficiency
        # needs >=100 KB copies; 64 tokens x 8 heads x 128 dims x 2 B =
        # 128 KB.  Memory granularity (<=63 wasted slots/seq) is cheap
        # next to the DMA-issue savings.
        L, KVH, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        self.page_size = page_size
        self.max_pages_per_seq = max_pages_per_seq
        self.n_pages = n_pages
        # PAGE-MAJOR pools, one PER-LAYER array [np, KVH, P, hd] in a list:
        # one DMA moves a whole page for all kv heads (the fused paged
        # kernel's transfer unit), and per-layer lists let forward() unroll
        # the decode layer loop over whole buffers — stacking [L, ...]
        # forces lax.scan to dynamic-slice each layer's pool in and out,
        # which XLA materializes as 100 MB copies per layer per step
        self.k_pages = [jnp.zeros((n_pages, KVH, page_size, hd), jnp.bfloat16)
                        for _ in range(L)]
        self.v_pages = [jnp.zeros((n_pages, KVH, page_size, hd), jnp.bfloat16)
                        for _ in range(L)]
        # page 0 is RESERVED scratch: inactive batcher slots (padded table
        # entries = 0, length 0) still execute the decode-step cache write,
        # so page 0 absorbs their garbage and must never be allocated
        self.free: list[int] = list(range(1, n_pages))
        self.tables: dict[int, list[int]] = {}   # uid → page ids

    @property
    def n_free(self) -> int:
        return len(self.free)

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def allocate(self, uid: int, n_tokens: int) -> list[int]:
        need = self.pages_needed(n_tokens)
        if need > len(self.free):
            raise PoolExhausted(
                f"page pool exhausted: need {need}, free {len(self.free)}"
            )
        pages = [self.free.pop() for _ in range(need)]
        self.tables.setdefault(uid, []).extend(pages)
        return pages

    def extend(self, uid: int, new_total_tokens: int) -> None:
        """Grow a sequence's table to cover new_total_tokens."""
        have = len(self.tables.get(uid, ()))
        need = self.pages_needed(new_total_tokens)
        if need > self.max_pages_per_seq:
            raise MemoryError(f"sequence {uid} exceeds max_pages_per_seq")
        if need > have:
            for _ in range(need - have):
                if not self.free:
                    raise PoolExhausted("page pool exhausted")
                self.tables[uid].append(self.free.pop())

    def release(self, uid: int) -> None:
        self.free.extend(p for p in self.tables.pop(uid, ()) if p != 0)

    def evict_before(self, uid: int, min_pos: int) -> int:
        """Free pages whose every position is < min_pos (sliding-window
        serving: positions behind the window are masked by the attention
        kernel, so their physical pages can be reused NOW).  The table
        entry is repointed at the reserved scratch page 0 — the kernel
        still gathers it, but every element is masked.  Returns the number
        of pages freed."""
        pages = self.tables.get(uid)
        if not pages:
            return 0
        n_evictable = min_pos // self.page_size
        freed = 0
        for b in range(min(n_evictable, len(pages))):
            if pages[b] != 0:
                self.free.append(pages[b])
                pages[b] = 0
                freed += 1
        return freed

    def table_array(self, uids: list[int]) -> jnp.ndarray:
        """[len(uids), max_pages_per_seq] int32, padded with page 0."""
        out = np.zeros((len(uids), self.max_pages_per_seq), np.int32)
        for i, uid in enumerate(uids):
            pages = self.tables.get(uid, [])
            out[i, : len(pages)] = pages
        return jnp.asarray(out)

    def write_prefill(self, uid: int, k: jax.Array, v: jax.Array) -> None:
        """Scatter a prompt's contiguous KV [L, KVH, T, hd] into uid's pages
        (already kv-head major: a straight reshape to pages, no transpose)."""
        L, KVH, T, hd = k.shape
        P = self.page_size
        self.extend(uid, T)
        pages = self.tables[uid]
        pad = self.pages_needed(T) * P - T
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # [L, KVH, np_used, P, hd] → [L, np_used, KVH, P, hd]
        kp = jnp.transpose(kp.reshape(L, KVH, -1, P, hd), (0, 2, 1, 3, 4))
        vp = jnp.transpose(vp.reshape(L, KVH, -1, P, hd), (0, 2, 1, 3, 4))
        idx = jnp.asarray(pages[: kp.shape[1]], jnp.int32)
        self.k_pages = [dst.at[idx].set(kp[l].astype(jnp.bfloat16))
                        for l, dst in enumerate(self.k_pages)]
        self.v_pages = [dst.at[idx].set(vp[l].astype(jnp.bfloat16))
                        for l, dst in enumerate(self.v_pages)]

    def decode_cache(self, uids: list[int], lengths) -> dict:
        """Build the forward() paged-cache dict for these sequences."""
        return {
            "k_pages": self.k_pages,
            "v_pages": self.v_pages,
            "tables": self.table_array(uids),
            "length": jnp.asarray(lengths, jnp.int32),
        }

    def update_from(self, cache: dict) -> None:
        """Write back pools mutated by a decode step."""
        self.k_pages = list(cache["k_pages"])
        self.v_pages = list(cache["v_pages"])


class PagedBatcher:
    """Continuous batching over the paged pool (same API as ContinuousBatcher).

    Fixed slot count for jit-stable decode shapes; each slot maps to a pool
    sequence (uid).  Admission prefills through a scratch contiguous cache,
    scatters the prompt KV into pool pages, and frees pages on retirement —
    memory scales with live tokens, not slots × max_len.
    """

    def __init__(self, params, lora, cfg, lcfg=None, *, num_slots=128,
                 n_pages=512, page_size=64, max_pages_per_seq=16,
                 prefill_buckets=(128, 256, 512), eos_id=2, sparams=None,
                 seed=0, decode_impl=None, prefill_impl=None,
                 rolling_eviction=True, tp_mesh=None,
                 steps_per_dispatch=1, admit_batch=1,
                 spec_draft_len=0, spec_ngram=2,
                 spec_adaptive=False, spec_break_even=1.35,
                 admission="optimistic"):
        # num_slots defaults to 128: the decode matmul's M dim equals the
        # slot count, and the fused NF4 kernel's MXU cost at M=16 equals
        # M=128 (row padding) — batching to M≈128 is ~free throughput ×8
        # (round-1 ablation; VERDICT perf lever 1).  Page pool sizing is
        # model-dependent: 2048×16 = 32k pooled tokens.
        from qlora_tpu.generate.continuous import Request
        from qlora_tpu.generate.sampler import SamplingParams
        from qlora_tpu.lora import LoraConfig

        self.Request = Request
        self.params, self.lora, self.cfg = params, lora, cfg
        self.lcfg = lcfg or LoraConfig()
        self.num_slots = num_slots
        self.eos_id = eos_id
        self.sparams = sparams or SamplingParams()
        self.rng = jax.random.PRNGKey(seed)
        self.pool = PagedPool(cfg, n_pages, page_size, max_pages_per_seq)
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        # decode_impl opts decode steps into int8-MXU serving kernels
        # (~1.2% rel. error; prefill stays bf16-exact):
        #   "int8" — per-column int8 weights requantized offline at init
        #            (fastest: no in-kernel decode; +8 bits/param HBM)
        #   "w8a8" — NF4 storage, nibbles decoded to int8 in-kernel
        #            (no extra HBM; wins at large slot counts)
        self.decode_impl = decode_impl
        # prefill_impl="w8a8" opts PREFILL into the in-kernel int8 path too:
        # at prefill M (the bucket length, 128-512) the int8 MXU runs ~2× the
        # bf16 rate (measured v5e M=1024: 119µs vs 232µs per 4096² layer) at
        # ~1.2% relative error.  Default None keeps prefill bf16-exact.
        self.prefill_impl = prefill_impl
        # sliding-window models: free pages fully behind the window (their
        # contents are masked by the kernel, so eviction is exact)
        self.rolling_eviction = rolling_eviction
        # tensor-parallel serving: megatron-shard the params over a ("tp",)
        # mesh, head-shard the page pools, and route prefill/decode through
        # shard_map forwards (models bigger than one chip's HBM)
        # multi-step scheduling: run N decode steps inside ONE dispatch
        # (greedy within the burst; tokens emitted after it).  Amortizes
        # the host/relay per-dispatch cost across N tokens — admissions
        # and EOS retirement happen at burst boundaries, so TTFT trades
        # against sustained tokens/s exactly as in production engines.
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        # batched admission: prefill up to admit_batch same-bucket prompts
        # in ONE dispatch of fixed group size (short groups pad with dummy
        # rows whose pages scatter into reserved page 0) — under admission
        # waves this amortizes the per-dispatch cost the same way
        # steps_per_dispatch does for decode.  Singleton admissions keep
        # the [1, bucket] program, so trickle traffic pays no padding.
        self.admit_batch = max(int(admit_batch), 1)
        # speculative serving: each "decode step" becomes a VERIFY CHUNK of
        # spec_draft_len prompt-lookup drafts + the pending token, retiring
        # 1..spec_draft_len+1 tokens per weight pass (the B=1 speculation
        # win composed with continuous batching; the TPU-native answer to
        # the reference's admitted inference-speed gap,
        # /root/reference/README.md:135).  Drafting runs IN-GRAPH over a
        # per-slot context buffer, so steps_per_dispatch chunks run inside
        # one dispatch; acceptance is greedy-exact (default sparams) or
        # rejection-sampled (do_sample), both schedule-invariant — the
        # OUTPUT never depends on draft quality, only tokens/chunk does.
        self.spec_draft_len = int(spec_draft_len)
        self.spec_ngram = int(spec_ngram)
        self._spec_jit = None
        if self.spec_draft_len > 0:
            # tp serving composes too: the shard_map forward dispatches by
            # S, so a [slots, k+1] chunk runs the fused paged CHUNK kernel
            # on each device's local heads; drafting is host-side there
            # (one chunk per dispatch, like the rest of the tp loop)
            sp = sparams
            if sp is not None and sp.do_sample and (
                    sp.repetition_penalty != 1.0
                    or sp.no_repeat_ngram_size > 0):
                raise NotImplementedError(
                    "repetition_penalty / no_repeat_ngram_size do not "
                    "compose with speculation (in-chunk history "
                    "dependence); drop them or spec_draft_len=0")
            cap = page_size * max_pages_per_seq
            self._ctx_cap = cap
            self.ctx_host = np.zeros((num_slots, cap), np.int32)
            self.cur_host = np.zeros((num_slots,), np.int32)
            # acceptance telemetry: tokens emitted / per-slot verify chunks
            # (spec_tokens / spec_chunks = mean tokens retired per chunk)
            self.spec_tokens = 0
            self.spec_chunks = 0
            # spec_adaptive: speculation safe-by-default.  A verify chunk
            # costs ~1.15-1.3x a plain decode step (the Cx attention/
            # logits VPU work, benchmarks/spec_chunk_cost.py; the ratio is
            # worst at LOW occupancy — measured 1.27x at 16 active slots,
            # 1.15x at 32), so speculation LOSES whenever acceptance drops
            # below that ratio (i.i.d. prompts with no reuse: ~1.1-1.2
            # tok/chunk -> 13% slower than plain at 32 slots).  Adaptive
            # mode watches a window of recent tokens-per-chunk; below
            # spec_break_even (default 1.35: the worst-case cost ratio
            # plus margin; reuse-heavy traffic runs ~2 tok/chunk, far
            # clear of it) the engine falls back to the plain decode path
            # for a holdoff, then re-probes (contexts can become
            # reuse-friendly as generation proceeds).
            # Greedy output is invariant either way — both paths emit the
            # model's own argmax — so adaptivity changes only throughput.
            # The decision window accumulates per-slot CHUNKS (not
            # dispatches): at serving scale (32 slots x spd 16 = 512
            # chunks/dispatch) one dispatch decides; small engines
            # accumulate across a few.  A dispatch is atomic, so that is
            # also the minimum demotion latency.
            self.spec_adaptive = bool(spec_adaptive)
            self.spec_break_even = float(spec_break_even)
            self._spec_window_chunks = 64   # chunk samples per decision
            self._spec_holdoff = 8          # plain dispatches per demotion
            self._spec_tok_acc = 0
            self._spec_chunk_acc = 0
            # probe order: PLAIN first — the plain decode program compiles
            # during engine warmup traffic instead of mid-measurement the
            # first time acceptance collapses (greedy output is unchanged)
            self._spec_skip = 1 if self.spec_adaptive else 0
            # telemetry: dispatches where speculation was adaptively off
            self.spec_plain_dispatches = 0
        self.tp_mesh = tp_mesh
        self._tp_prefill_fn = self._tp_decode_fn = None
        if tp_mesh is not None:
            if decode_impl == "w8a8":
                raise NotImplementedError(
                    "decode_impl='w8a8' is single-chip; tp serving supports "
                    "decode_impl='int8' (chunk-local per-column requant) or "
                    "the exact bf16 Pallas kernels")
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from qlora_tpu.parallel.megatron_step import (
                megatron_lora_specs, megatron_param_specs,
            )
            from qlora_tpu.parallel.tp_decode import (
                PAGED_CACHE_SPECS, make_tp_forward_fn, shard_decode_params,
            )

            def _put(tree, specs):
                return jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, NamedSharding(tp_mesh, s)),
                    tree, specs, is_leaf=lambda x: isinstance(x, _P),
                )

            orig_params = params
            self.params = params = shard_decode_params(params, tp_mesh)
            if lora is not None:
                self.lora = lora = _put(lora, megatron_lora_specs(lora))
            # prefill_impl="w8a8" works per-shard too: local_chunk hands the
            # in-kernel int8 path a self-contained NF4 K-chunk
            self._tp_prefill_fn = make_tp_forward_fn(
                cfg, self.lcfg, tp_mesh, params, lora, impl=prefill_impl)
            self.decode_params = params
            if decode_impl == "int8":
                # chunk-local per-column int8 serving copy: row-parallel
                # linears quantize per K-chunk so each device's partial
                # dequantizes exactly before the psum
                from qlora_tpu.generate.serve_int8 import (
                    requantize_params_int8,
                )

                dec = requantize_params_int8(
                    orig_params,
                    row_parallel_k_shards=tp_mesh.shape["tp"])
                dec_blocks = _put(dec["blocks"],
                                  megatron_param_specs(dec)["blocks"])
                self.decode_params = dict(params, blocks=dec_blocks)
            self._tp_decode_fn = make_tp_forward_fn(
                cfg, self.lcfg, tp_mesh, self.decode_params, lora,
                paged=True, impl="w8a8" if decode_impl == "int8" else None)
            pool_spec = NamedSharding(tp_mesh, PAGED_CACHE_SPECS["k_pages"])
            self.pool.k_pages = [jax.device_put(x, pool_spec)
                                 for x in self.pool.k_pages]
            self.pool.v_pages = [jax.device_put(x, pool_spec)
                                 for x in self.pool.v_pages]
        else:
            from qlora_tpu.models.unstack import unstack_lora, unstack_params

            # per-layer decode trees: forward() unrolls the layer loop with
            # no scan slice copies (the single-chip serving fast path)
            if decode_impl == "int8":
                from qlora_tpu.generate.serve_int8 import (
                    requantize_params_int8_unstacked,
                )

                self.decode_params = requantize_params_int8_unstacked(params)
            else:
                self.decode_params = unstack_params(params)
            self._dec_lora = unstack_lora(lora, cfg.num_layers)
            self._decode_jit = self._make_decode_jit()
            self._prefill_jit = self._make_prefill_jit()
            if self.spec_draft_len > 0:
                self._spec_jit = self._make_spec_jit()
            # jax.jit is lazy: the [admit_batch, bucket] program only
            # compiles if a multi-admission wave actually occurs
            self._prefill_group_jit = self._make_prefill_group_jit()
        self.slot_req = [None] * num_slots
        self.slot_uid = [0] * num_slots          # 0 = free (uid 0 reserved)
        self.last_tokens = np.zeros((num_slots,), np.int32)
        self.lengths = np.zeros((num_slots,), np.int32)
        self.queue = []
        self._uid = 0
        # admission="optimistic" (vLLM-style, the default): admit when the
        # PROMPT fits (pages_needed(L+1) + a small watermark), grow pages
        # on demand, and on pool exhaustion mid-decode preempt the
        # youngest sequence — release its pages and requeue it for
        # recompute (prefill is one fused dispatch, so recompute is
        # cheap).  "reserved" restores the round-4 behavior: admit only
        # when the worst case pages_needed(L + max_new_tokens) is free —
        # occupancy bounded by every live request's worst case.
        if admission not in ("optimistic", "reserved"):
            raise ValueError(f"admission={admission!r}")
        self.admission = admission
        self._watermark = max(1, n_pages // 64)
        self.preemptions = 0
        self.preemption_log = []   # (uid, tokens generated when evicted)
        # reserved mode: aggregate worst-case accounting (uid → its
        # pages_needed(L + max_new)); admission holds back until the SUM
        # of live worst cases fits the pool, so exhaustion (and therefore
        # preemption) is impossible by construction
        self._reserved: dict[int, int] = {}

    def _make_decode_jit(self):
        import contextlib
        import functools

        from qlora_tpu.models.transformer import forward
        from qlora_tpu.ops.qmatmul import default_impl

        from qlora_tpu.generate.sampler import sample_token

        N = self.steps_per_dispatch

        # donate the cache: the pools flow through the kernels' aliased
        # outputs in place instead of XLA double-buffering ~GBs of pool
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode(dec_params, lora, cache, toks):
            ctx = (default_impl("w8a8") if self.decode_impl
                   else contextlib.nullcontext())
            with ctx:
                logits, cache = forward(dec_params, lora, toks, self.cfg,
                                        self.lcfg, cache=cache)
            return logits, cache

        self._decode_burst = None
        if N == 1:
            return decode

        # multi-step burst: N sampled decode steps inside one dispatch
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_burst(dec_params, lora, cache, toks, rng):
            ctx = (default_impl("w8a8") if self.decode_impl
                   else contextlib.nullcontext())
            with ctx:
                def body(carry, i):
                    cache, toks = carry
                    logits, cache = forward(dec_params, lora, toks, self.cfg,
                                            self.lcfg, cache=cache)
                    tok = sample_token(jax.random.fold_in(rng, i),
                                       logits[:, 0], self.sparams)
                    return (cache, tok[:, None]), tok

                (cache, _), toks_all = jax.lax.scan(
                    body, (cache, toks), jnp.arange(N))
            return toks_all, cache                     # [N, slots], cache

        self._decode_burst = decode_burst
        return decode

    def _make_spec_jit(self):
        """Speculative burst: steps_per_dispatch verify chunks in ONE
        dispatch.  Each chunk drafts spec_draft_len tokens in-graph
        (prompt-lookup over the per-slot context buffer), verifies them in
        one [slots, k+1] forward through the fused paged CHUNK kernel
        (ops.paged_attention.fused_paged_chunk_attention), and rolls each
        slot's cache back to its verified prefix — per-slot acceptance,
        per-slot rollback.  Inactive slots ride along into scratch page 0
        exactly like the plain decode step."""
        import contextlib
        import functools

        from qlora_tpu.models.transformer import forward
        from qlora_tpu.ops.qmatmul import default_impl

        from qlora_tpu.generate.speculative import (
            _target_probs, accept_and_resample,
        )

        k = self.spec_draft_len
        C = k + 1
        N = self.steps_per_dispatch
        ngram = self.spec_ngram
        cap = self._ctx_cap
        S = self.num_slots
        sparams = self.sparams
        sampled = sparams is not None and sparams.do_sample
        rows = jnp.arange(S)
        span = jnp.arange(cap - ngram + 1)

        def draft(ctx, cur):
            """Latest earlier occurrence of the trailing ngram → next k
            tokens (same matcher as speculative._spec_loop)."""
            match = jnp.ones((S, cap - ngram + 1), bool)
            for g in range(ngram):
                last_g = ctx[rows, cur - ngram + g]              # [S]
                match &= ctx[:, g:cap - ngram + 1 + g] == last_g[:, None]
            match &= span[None, :] < (cur - ngram)[:, None]
            best = jnp.max(jnp.where(match, span[None, :], -1), axis=1)
            start = jnp.clip(best + ngram, 0, cap - k)
            return jax.vmap(
                lambda c, s: jax.lax.dynamic_slice(c, (s,), (k,))
            )(ctx, start)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def spec_burst(dec_params, lora, cache, ctx, cur, rng):
            """ctx [S, cap] (row valid through cur[s]); cur = prompt +
            emitted tokens (the last one pending, its KV unwritten).
            Returns (out [S, N*C], tot [S], cache): out[s, :tot[s]] are the
            newly emitted tokens."""
            ctx_impl = (default_impl("w8a8") if self.decode_impl
                        else contextlib.nullcontext())
            out0 = jnp.zeros((S, N * C), jnp.int32)
            idx = jnp.arange(C)

            with ctx_impl:
                def body(carry, i):
                    cache, ctx, cur, out, tot = carry
                    pending = ctx[rows, cur - 1][:, None]        # [S, 1]
                    drafts = draft(ctx, cur)                     # [S, k]
                    inp = jnp.concatenate([pending, drafts], axis=1)
                    cache = dict(cache, length=cur - 1)
                    logits, cache = forward(dec_params, lora, inp,
                                            self.cfg, self.lcfg,
                                            cache=cache)
                    if sampled:
                        probs = _target_probs(
                            logits.reshape(S * C, -1), sparams
                        ).reshape(S, C, -1)
                        toks, n_acc = accept_and_resample(
                            jax.random.fold_in(rng, i), probs, drafts)
                    else:
                        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                        acc = jnp.cumprod(drafts == toks[:, :-1], axis=1)
                        n_acc = 1 + jnp.sum(acc, axis=1)         # 1..C
                    wmask = idx[None] < n_acc[:, None]           # [S, C]
                    out = out.at[
                        rows[:, None],
                        jnp.where(wmask, tot[:, None] + idx[None], N * C),
                    ].set(jnp.where(wmask, toks, 0), mode="drop")
                    ctx = ctx.at[
                        rows[:, None],
                        jnp.where(wmask, cur[:, None] + idx[None], cap),
                    ].set(jnp.where(wmask, toks, 0), mode="drop")
                    return (cache, ctx, cur + n_acc, out, tot + n_acc), None

                (cache, ctx, cur, out, tot), _ = jax.lax.scan(
                    body, (cache, ctx, cur, out0, jnp.zeros((S,), jnp.int32)),
                    jnp.arange(N))
            return out, tot, cache

        return spec_burst

    def _host_drafts(self):
        """Prompt-lookup drafts per slot from the host context mirror —
        the tp path's drafting (the single-chip path drafts in-graph)."""
        k, n = self.spec_draft_len, self.spec_ngram
        drafts = np.zeros((self.num_slots, k), np.int32)
        for s, r in enumerate(self.slot_req):
            if r is None:
                continue
            cur = int(self.cur_host[s])
            if cur < n + 1:
                continue
            ctx = self.ctx_host[s, :cur]
            tail = ctx[-n:]
            win = np.lib.stride_tricks.sliding_window_view(ctx, n)
            m = np.nonzero((win == tail).all(1))[0]
            m = m[m < cur - n]          # strictly earlier occurrence
            if len(m):
                d = ctx[m[-1] + n: m[-1] + n + k]
                drafts[s, : len(d)] = d
        return drafts

    def _spec_gate(self):
        """Adaptive speculation admission for this dispatch.  Fixed mode
        always speculates; adaptive mode sits out ``_spec_holdoff``
        dispatches after the rolling tokens-per-chunk falls below
        ``spec_break_even``, then re-probes."""
        if not self.spec_adaptive:
            return True
        if self._spec_skip > 0:
            self._spec_skip -= 1
            self.spec_plain_dispatches += 1
            return False
        return True

    def _spec_account(self, disp_tokens, disp_chunks):
        """Record one speculative dispatch's acceptance and demote to the
        plain path when the accumulated window says chunks are not
        paying (tokens/chunk below break-even)."""
        self.spec_tokens += disp_tokens
        self.spec_chunks += disp_chunks
        if not self.spec_adaptive or not disp_chunks:
            return
        self._spec_tok_acc += disp_tokens
        self._spec_chunk_acc += disp_chunks
        if self._spec_chunk_acc < self._spec_window_chunks:
            return
        if self._spec_tok_acc / self._spec_chunk_acc < self.spec_break_even:
            self._spec_skip = self._spec_holdoff
        self._spec_tok_acc = self._spec_chunk_acc = 0

    def _spec_step(self):
        """One speculative dispatch; returns finished requests, or None when
        a slot lacks room for a full burst (caller falls back to the plain
        per-token decode step for this dispatch)."""
        k = self.spec_draft_len
        C = k + 1
        tp = self._tp_decode_fn is not None
        N = 1 if tp else self.steps_per_dispatch
        cap = self.pool.max_pages_per_seq * self.pool.page_size
        window = self.cfg.sliding_window if self.rolling_eviction else None
        # every active slot needs room for the burst's worst case (the
        # chunk kernel's precondition is length + C <= table capacity, and
        # retirement happens at cap-1 like the decode path)
        room = min((cap - 1 - int(self.lengths[s])
                    for s, r in enumerate(self.slot_req) if r is not None),
                   default=0)
        if room < N * C:
            return None
        for slot, r in enumerate(self.slot_req):
            if r is not None:
                if window:
                    self.pool.evict_before(
                        self.slot_uid[slot],
                        int(self.lengths[slot]) + 1 - window,
                    )
                self._extend_or_preempt(slot,
                                        int(self.lengths[slot]) + N * C)
        if self.num_active == 0:
            return []
        cache = self.pool.decode_cache(self.slot_uid, self.lengths)
        self.rng, sub = jax.random.split(self.rng)
        if tp:
            # one [slots, C] verify chunk through the shard_map forward;
            # acceptance on host (the tp loop is per-dispatch anyway)
            from qlora_tpu.generate.speculative import (
                _target_probs, accept_and_resample,
            )

            drafts = self._host_drafts()
            inp = np.concatenate(
                [self.last_tokens[:, None], drafts], axis=1)
            logits, cache = self._tp_decode_fn(
                self.decode_params, self.lora, jnp.asarray(inp), cache)
            if self.sparams is not None and self.sparams.do_sample:
                S = self.num_slots
                probs = _target_probs(
                    logits.reshape(S * C, -1), self.sparams
                ).reshape(S, C, -1)
                toks, n_acc = accept_and_resample(
                    sub, probs, jnp.asarray(drafts))
                out, tot = np.asarray(toks), np.asarray(n_acc)
            else:
                out = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
                acc = np.cumprod(drafts == out[:, :-1], axis=1)
                tot = 1 + acc.sum(axis=1)
        else:
            # inactive slots upload cur=1 (length 0): their garbage chunk
            # lands in reserved scratch page 0, like the plain decode step
            out, tot, cache = self._spec_jit(
                self.decode_params, self._dec_lora, cache,
                jnp.asarray(self.ctx_host),
                jnp.asarray(np.maximum(self.cur_host, 1)), sub)
            out = np.asarray(out)
            tot = np.asarray(tot)
        self.pool.update_from(cache)
        finished = []
        disp_tokens = disp_chunks = 0
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            t_n = int(tot[slot])
            disp_tokens += t_n
            disp_chunks += N
            for i in range(t_n):
                if not req.done:
                    self._emit(req, int(out[slot, i]))
            # the DEVICE advanced the slot by all t_n tokens (host discards
            # post-eos/post-budget ones; such slots retire below)
            cur = int(self.cur_host[slot])
            self.ctx_host[slot, cur: cur + t_n] = out[slot, :t_n]
            self.cur_host[slot] += t_n
            self.lengths[slot] += t_n
            self.last_tokens[slot] = int(out[slot, t_n - 1])
            if req.done or self.lengths[slot] >= cap - 1:
                req.done = True
                finished.append(req)
                self._release_slot(slot)
        self._spec_account(disp_tokens, disp_chunks)
        return finished

    def _make_prefill_jit(self):
        """ONE dispatch per admission: prompt forward + page scatter +
        first-token sample, with the page pools donated (in-place).

        The eager admission path (``_prefill_kv`` + ``write_prefill``) issues
        ~2·num_layers separate scatter ops plus pad/transpose glue — ~70
        relayed dispatches per admission, which dominated the serving-system
        trace (measured ~0.7 s/admission at 7B on the relay vs ~0.1 s for
        this fused path).  Pages past the prompt's last page scatter into
        the reserved scratch page 0, whose contents are never unmasked."""
        import contextlib
        import functools

        from qlora_tpu.generate.sampler import sample_token
        from qlora_tpu.models.transformer import forward, init_cache
        from qlora_tpu.ops.qmatmul import default_impl

        P = self.pool.page_size

        @functools.partial(jax.jit, donate_argnums=(6, 7))
        def prefill(params, lora, ids, length, idx, rng, k_pages, v_pages):
            bucket = ids.shape[1]
            cache = init_cache(self.cfg, 1, bucket)
            positions = jnp.arange(bucket)[None, :]
            ctx = (default_impl(self.prefill_impl) if self.prefill_impl
                   else contextlib.nullcontext())
            with ctx:
                logits, cache = forward(params, lora, ids, self.cfg,
                                        self.lcfg, cache=cache,
                                        positions=positions)
            tok = sample_token(rng, logits[0, length - 1][None],
                               self.sparams)[0]
            k = cache["k"][:, 0]                     # [L, KVH, bucket, hd]
            v = cache["v"][:, 0]
            L_, KVH, _, hd = k.shape
            npg = idx.shape[0]
            pad = npg * P - bucket
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            # [L, KVH, npg, P, hd] → [L, npg, KVH, P, hd]
            kp = jnp.transpose(kp.reshape(L_, KVH, npg, P, hd),
                               (0, 2, 1, 3, 4)).astype(k_pages[0].dtype)
            vp = jnp.transpose(vp.reshape(L_, KVH, npg, P, hd),
                               (0, 2, 1, 3, 4)).astype(v_pages[0].dtype)
            k_pages = [dst.at[idx].set(kp[l])
                       for l, dst in enumerate(k_pages)]
            v_pages = [dst.at[idx].set(vp[l])
                       for l, dst in enumerate(v_pages)]
            return tok, k_pages, v_pages

        return prefill

    def _make_prefill_group_jit(self):
        """Batched admission: up to admit_batch same-bucket prompts prefill
        in ONE dispatch — forward at [G, bucket], all layers' page scatter,
        and the G first-token samples.  Groups shorter than G pad with
        dummy rows (ids 0, length 1, pages all 0): their KV lands in the
        reserved scratch page 0 and their sampled token is discarded, so
        padding costs compute but never correctness."""
        import contextlib
        import functools

        from qlora_tpu.generate.sampler import sample_token
        from qlora_tpu.models.transformer import forward, init_cache
        from qlora_tpu.ops.qmatmul import default_impl

        P = self.pool.page_size

        @functools.partial(jax.jit, donate_argnums=(6, 7))
        def prefill_group(params, lora, ids, lengths, idx, rng,
                          k_pages, v_pages):
            G, bucket = ids.shape
            cache = init_cache(self.cfg, G, bucket)
            positions = jnp.broadcast_to(jnp.arange(bucket)[None, :],
                                         (G, bucket))
            ctx = (default_impl(self.prefill_impl) if self.prefill_impl
                   else contextlib.nullcontext())
            with ctx:
                logits, cache = forward(params, lora, ids, self.cfg,
                                        self.lcfg, cache=cache,
                                        positions=positions)
            toks = sample_token(rng, logits[jnp.arange(G), lengths - 1],
                                self.sparams)                    # [G]
            k = cache["k"]                     # [L, G, KVH, bucket, hd]
            v = cache["v"]
            L_, _, KVH, _, hd = k.shape
            npg = idx.shape[1]
            pad = npg * P - bucket
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
            # [L, G, KVH, npg, P, hd] → [L, G·npg, KVH, P, hd]; duplicate
            # scatter indices only ever collide on scratch page 0
            kp = jnp.transpose(kp.reshape(L_, G, KVH, npg, P, hd),
                               (0, 1, 3, 2, 4, 5)
                               ).reshape(L_, G * npg, KVH, P, hd)
            vp = jnp.transpose(vp.reshape(L_, G, KVH, npg, P, hd),
                               (0, 1, 3, 2, 4, 5)
                               ).reshape(L_, G * npg, KVH, P, hd)
            flat = idx.reshape(-1)
            k_pages = [dst.at[flat].set(kp[l].astype(dst.dtype))
                       for l, dst in enumerate(k_pages)]
            v_pages = [dst.at[flat].set(vp[l].astype(dst.dtype))
                       for l, dst in enumerate(v_pages)]
            return toks, k_pages, v_pages

        return prefill_group

    def submit(self, prompt, max_new_tokens=128, on_token=None):
        self._uid += 1
        req = self.Request(self._uid, list(prompt), max_new_tokens,
                           on_token=on_token)
        self.queue.append(req)
        return req

    @property
    def num_active(self):
        return sum(r is not None for r in self.slot_req)

    def _prefill_kv(self, ids_1xS, length, bucket):
        """Run the prompt through a scratch contiguous cache; return
        (last_logits [V], k [L,KVH,S,hd], v)."""
        import contextlib

        from qlora_tpu.models.transformer import forward, init_cache
        from qlora_tpu.ops.qmatmul import default_impl

        cache = init_cache(self.cfg, 1, bucket)
        if self._tp_prefill_fn is not None:
            from qlora_tpu.parallel.tp_decode import shard_tp_cache

            # fresh cache has length 0, so forward's default positions are
            # arange(bucket) — identical to the explicit positions below
            cache = shard_tp_cache(cache, self.tp_mesh)
            logits, cache = self._tp_prefill_fn(self.params, self.lora,
                                                ids_1xS, cache)
            return logits[0, length - 1], cache["k"][:, 0], cache["v"][:, 0]
        positions = jnp.arange(bucket)[None, :]
        ctx = (default_impl(self.prefill_impl) if self.prefill_impl
               else contextlib.nullcontext())
        with ctx:
            logits, cache = forward(self.params, self.lora, ids_1xS, self.cfg,
                                    self.lcfg, cache=cache, positions=positions)
        return logits[0, length - 1], cache["k"][:, 0], cache["v"][:, 0]

    def _admit(self):
        from qlora_tpu.generate.sampler import sample_token

        P = self.pool.page_size
        admits = []   # (slot, req, uid, L, bucket, prompt) — fused path
        for slot in range(self.num_slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            max_tokens = self.pool.max_pages_per_seq * self.pool.page_size
            req = self.queue[0]
            # prompt must fit the largest prefill bucket AND leave room for
            # generation (longer prompts truncate from the left)
            cap = min(max_tokens - req.max_new_tokens, self.prefill_buckets[-1])
            prompt = req.prompt[-cap:]
            L = len(prompt)
            if self.cfg.sliding_window and self.rolling_eviction:
                # rolling eviction caps LIVE pages at ~window/page_size + 2
                # (prefill holds the whole prompt transiently)
                need = max(
                    self.pool.pages_needed(L + 1),
                    self.pool.pages_needed(self.cfg.sliding_window) + 2,
                )
            elif self.admission == "optimistic":
                # admit on the prompt's own footprint + a watermark; decode
                # grows pages on demand and preempts on exhaustion
                need = self.pool.pages_needed(L + 1) + self._watermark
            else:
                # true reservation: the SUM of live requests' worst cases
                # must fit the pool (n_pages - 1: page 0 is scratch), so
                # mid-decode exhaustion cannot happen
                wc = self.pool.pages_needed(L + req.max_new_tokens)
                if (sum(self._reserved.values()) + wc
                        > self.pool.n_pages - 1):
                    break
                need = self.pool.pages_needed(L + 1)
            if need > self.pool.n_free:
                break  # not enough pages yet; wait for retirements
            self.queue.pop(0)
            bucket = next((b for b in self.prefill_buckets if b >= L),
                          self.prefill_buckets[-1])
            uid = req.uid
            if self.admission == "reserved":
                self._reserved[uid] = wc
            if self._tp_prefill_fn is None:
                # fused single-dispatch admission (see _make_prefill_jit);
                # dispatched below, possibly grouped
                self.pool.allocate(uid, L + 1)  # room for the next token too
                admits.append((slot, req, uid, L, bucket, prompt))
                continue
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :L] = prompt
            self.rng, sub = jax.random.split(self.rng)
            last, k, v = self._prefill_kv(jnp.asarray(ids), jnp.int32(L),
                                          bucket)
            self.pool.allocate(uid, L + 1)
            self.pool.write_prefill(uid, k[:, :, :L], v[:, :, :L])
            tok = int(sample_token(sub, last[None], self.sparams)[0])
            self._finish_admit(slot, req, uid, L, tok)

        # dispatch the fused admissions: consecutive same-bucket admissions
        # group into ONE [admit_batch, bucket] prefill dispatch (padded with
        # dummy rows); async — no host sync until every group is queued
        pending = []
        i = 0
        while i < len(admits):
            bucket = admits[i][4]
            chunk = [admits[i]]
            while (len(chunk) < self.admit_batch
                   and i + len(chunk) < len(admits)
                   and admits[i + len(chunk)][4] == bucket):
                chunk.append(admits[i + len(chunk)])
            i += len(chunk)
            npg = -(-bucket // P)
            self.rng, sub = jax.random.split(self.rng)
            if len(chunk) == 1:
                slot, req, uid, L, bucket, prompt = chunk[0]
                ids = np.zeros((1, bucket), np.int32)
                ids[0, :L] = prompt
                idx = np.zeros((npg,), np.int32)
                pages = self.pool.tables[uid][:npg]
                idx[: len(pages)] = pages
                tok_d, kp, vp = self._prefill_jit(
                    self.params, self.lora, jnp.asarray(ids), jnp.int32(L),
                    jnp.asarray(idx), sub, self.pool.k_pages,
                    self.pool.v_pages)
                pending.append((slot, req, uid, L, tok_d))
            else:
                G = self.admit_batch
                ids = np.zeros((G, bucket), np.int32)
                lengths = np.ones((G,), np.int32)   # dummy rows: length 1
                idx = np.zeros((G, npg), np.int32)
                for j, (slot, req, uid, L, _, prompt) in enumerate(chunk):
                    ids[j, :L] = prompt
                    lengths[j] = L
                    pages = self.pool.tables[uid][:npg]
                    idx[j, : len(pages)] = pages
                toks_d, kp, vp = self._prefill_group_jit(
                    self.params, self.lora, jnp.asarray(ids),
                    jnp.asarray(lengths), jnp.asarray(idx), sub,
                    self.pool.k_pages, self.pool.v_pages)
                for j, (slot, req, uid, L, _, prompt) in enumerate(chunk):
                    pending.append((slot, req, uid, L, toks_d[j]))
            self.pool.k_pages = list(kp)
            self.pool.v_pages = list(vp)
        # async dispatch: do NOT block on the sampled token per group —
        # resolving int(tok_d) per admission serializes one host round-trip
        # per prompt; deferring lets consecutive prefill dispatches
        # pipeline on the device
        for slot, req, uid, L, tok_d in pending:
            self._finish_admit(slot, req, uid, L, int(tok_d))

    def _release_slot(self, slot):
        self._reserved.pop(self.slot_uid[slot], None)
        self.pool.release(self.slot_uid[slot])
        self.slot_req[slot] = None
        self.slot_uid[slot] = 0
        self.lengths[slot] = 0
        if self.spec_draft_len > 0:
            self.cur_host[slot] = 0

    def _preempt(self, slot):
        """Evict a live sequence to free its pages: requeue the request at
        the queue FRONT (it is older than anything waiting) with its
        verified context as the new prompt — re-admission re-prefills
        prompt+generated in one fused dispatch and generation continues
        exactly where it stopped (greedy: same tokens; sampled: a fresh
        rng stream for the remainder)."""
        req = self.slot_req[slot]
        req.prompt = list(req.prompt) + list(req.generated)
        self.preemption_log.append((req.uid, len(req.generated)))
        self._release_slot(slot)
        self.queue.insert(0, req)
        self.preemptions += 1

    def _extend_or_preempt(self, slot, target_tokens):
        """Grow `slot`'s page table to cover target_tokens; on pool
        exhaustion preempt the youngest OTHER sequence and retry (last
        resort: preempt `slot` itself).  Returns False if `slot` was
        preempted.  Progress is guaranteed: every preemption frees >= 1
        page and older sequences always win, so the oldest request runs
        to completion."""
        while self.slot_req[slot] is not None:
            try:
                self.pool.extend(self.slot_uid[slot], target_tokens)
                return True
            except PoolExhausted:
                victims = [s for s, r in enumerate(self.slot_req)
                           if r is not None and s != slot]
                if not victims:
                    # self-preemption cannot make progress: re-admission
                    # would grow right back to the same exhaustion.  The
                    # pool is simply too small for this one sequence.
                    raise MemoryError(
                        "page pool too small for a single sequence "
                        f"(need {self.pool.pages_needed(target_tokens)} "
                        f"pages, pool {self.pool.n_pages - 1} usable); "
                        "raise n_pages or lower max_new_tokens") from None
                self._preempt(max(victims, key=lambda s: self.slot_uid[s]))
        return False

    def _finish_admit(self, slot, req, uid, L, tok):
        self._emit(req, tok)
        if req.done:
            self._reserved.pop(uid, None)
            self.pool.release(uid)
            return
        self.slot_req[slot] = req
        self.slot_uid[slot] = uid
        self.last_tokens[slot] = tok
        self.lengths[slot] = L
        if self.spec_draft_len > 0:
            # context buffer for in-graph drafting: the (truncated) prompt
            # is the length-L suffix of the submitted prompt, then the
            # pending first token
            self.ctx_host[slot, :] = 0
            if L > 0:
                self.ctx_host[slot, :L] = req.prompt[-L:]
            self.ctx_host[slot, L] = tok
            self.cur_host[slot] = L + 1

    def _decode_step(self):
        from qlora_tpu.generate.sampler import sample_token

        if self.spec_draft_len > 0 and self._spec_gate():
            r = self._spec_step()
            if r is not None:
                return r
            # fall through: a slot is too close to capacity for a full
            # burst — the plain per-token step drains it to retirement

        # grow page tables for slots about to write position `length`;
        # sliding-window models roll: pages fully behind the window free up
        window = self.cfg.sliding_window if self.rolling_eviction else None
        cap = self.pool.max_pages_per_seq * self.pool.page_size
        # burst only when every active slot has room for N tokens (static
        # shapes: the 1-step and N-step programs are each compiled once)
        n = self.steps_per_dispatch
        if n > 1 and self._tp_decode_fn is None:
            room = min((cap - 1 - int(self.lengths[s])
                        for s, r in enumerate(self.slot_req) if r is not None),
                       default=0)
            if room < n:
                n = 1
        else:
            n = 1
        for slot, r in enumerate(self.slot_req):
            if r is not None:
                if window:
                    self.pool.evict_before(
                        self.slot_uid[slot],
                        int(self.lengths[slot]) + 1 - window,
                    )
                self._extend_or_preempt(slot, int(self.lengths[slot]) + n)
        if self.num_active == 0:
            return []
        cache = self.pool.decode_cache(self.slot_uid, self.lengths)
        self.rng, sub = jax.random.split(self.rng)

        if self._tp_decode_fn is not None:
            logits, cache = self._tp_decode_fn(
                self.decode_params, self.lora,
                jnp.asarray(self.last_tokens)[:, None], cache,
            )
            toks_all = np.asarray(
                sample_token(sub, logits[:, 0], self.sparams))[None]
        elif n > 1:
            toks_all, cache = self._decode_burst(
                self.decode_params, self._dec_lora, cache,
                jnp.asarray(self.last_tokens)[:, None], sub,
            )
            toks_all = np.asarray(toks_all)            # [n, slots]
        else:
            logits, cache = self._decode_jit(
                self.decode_params, self._dec_lora, cache,
                jnp.asarray(self.last_tokens)[:, None],
            )
            toks_all = np.asarray(
                sample_token(sub, logits[:, 0], self.sparams))[None]
        self.pool.update_from(cache)
        # slot_req does not mutate between here and retirement below, so
        # `req is not None` alone identifies the slots this step advanced
        for k in range(toks_all.shape[0]):
            for slot, req in enumerate(self.slot_req):
                if req is None:
                    continue
                tok = int(toks_all[k, slot])
                if not req.done:
                    self._emit(req, tok)
                self.last_tokens[slot] = tok
        finished = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            # the DEVICE advanced every active slot by the full burst
            nb = toks_all.shape[0]
            if self.spec_draft_len > 0:
                # keep the speculation context mirror in sync (this plain
                # step runs as the near-capacity fallback in spec mode)
                cur = int(self.cur_host[slot])
                self.ctx_host[slot, cur: cur + nb] = toks_all[:, slot]
                self.cur_host[slot] += nb
            self.lengths[slot] += nb
            if req.done or self.lengths[slot] >= cap - 1:
                req.done = True
                finished.append(req)
                self._release_slot(slot)
        return finished

    def step(self):
        self._admit()
        if self.num_active == 0:
            return []
        return self._decode_step()

    def run_to_completion(self):
        done = []
        while self.queue or self.num_active:
            stepped = self.step()
            done.extend(stepped)
            if not stepped and not self.num_active and self.queue:
                raise MemoryError("queued requests cannot be admitted")
        return done

    def _emit(self, req, tok):
        if tok == self.eos_id:
            req.done = True
            return
        req.generated.append(tok)
        if req.on_token:
            req.on_token(req.uid, tok)
        if len(req.generated) >= req.max_new_tokens:
            req.done = True
