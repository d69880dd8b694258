"""Continuous batching: slot-based KV cache serving engine.

The BASELINE.json north-star decode path: a fixed pool of batch slots, each
holding one in-flight sequence with its own length; new requests are
admitted into free slots (prefill) while other slots keep decoding — no
global barrier on the longest sequence.

Host-side scheduler (`ContinuousBatcher`) + two jit programs:
* ``_prefill_into_slot`` — run one prompt, scatter its KV into the slot;
* ``_decode_all_slots``  — one token step for every active slot.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import forward, init_cache
from qlora_tpu.generate.sampler import SamplingParams, sample_token


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new_tokens: int = 128
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    on_token: Optional[Callable[[int, int], None]] = None  # (uid, token)


class ContinuousBatcher:
    """Slot-based continuous batching engine (single host, single chip/mesh)."""

    def __init__(
        self,
        params,
        lora,
        cfg: ModelConfig,
        lcfg: LoraConfig = LoraConfig(),
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        prefill_buckets: tuple = (128, 256, 512, 1024, 2048),
        eos_id: int = 2,
        sparams: SamplingParams = SamplingParams(),
        seed: int = 0,
    ):
        self.cfg, self.lcfg = cfg, lcfg
        self.num_slots, self.max_len = num_slots, max_len
        self.prefill_buckets = tuple(
            b for b in sorted(prefill_buckets) if b <= max_len
        ) or (max_len,)
        self.eos_id = eos_id
        self.sparams = sparams
        self.rng = jax.random.PRNGKey(seed)

        from qlora_tpu.models.unstack import (
            unstack_cache, unstack_lora, unstack_params,
        )

        # per-layer trees: decode runs forward()'s UNROLLED path (no scan
        # slice copies of the stacked weights/cache per step)
        self.cache = unstack_cache(init_cache(cfg, num_slots, max_len))
        self.params = unstack_params(params)
        self.lora = unstack_lora(lora, cfg.num_layers)
        self.slot_req: list[Optional[Request]] = [None] * num_slots
        self.last_tokens = np.zeros((num_slots,), np.int32)
        self.queue: list[Request] = []
        self._uid = 0

        self._prefill = self._make_prefill()
        self._decode = self._make_decode()

    # ------------------------------------------------------------------ API

    def submit(self, prompt: list[int], max_new_tokens: int = 128,
               on_token=None) -> Request:
        self._uid += 1
        req = Request(self._uid, list(prompt), max_new_tokens, on_token=on_token)
        self.queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def step(self) -> list[Request]:
        """Admit queued requests into free slots, then decode one token for
        all active slots. Returns requests that finished this step."""
        self._admit()
        if self.num_active == 0:
            return []
        finished = self._decode_step()
        return finished

    def run_to_completion(self) -> list[Request]:
        done = []
        while self.queue or self.num_active:
            done.extend(self.step())
        return done

    # ------------------------------------------------------------- internals

    def _make_prefill(self):
        @functools.partial(jax.jit, static_argnames=("bucket",))
        def prefill(params, lora, cache, ids_1xS, length, slot, bucket):
            # run the prompt with a batch-1 cache view, then scatter into slot
            # per-layer list entries [slots, KVH, T, hd]: batch at axis 0
            sub = {
                "k": [jax.lax.dynamic_slice_in_dim(x[:, :, :bucket], slot, 1,
                                                   axis=0)
                      for x in cache["k"]],
                "v": [jax.lax.dynamic_slice_in_dim(x[:, :, :bucket], slot, 1,
                                                   axis=0)
                      for x in cache["v"]],
                "length": jnp.zeros((1,), jnp.int32),
            }
            positions = jnp.arange(bucket)[None, :]
            logits, sub = forward(
                params, lora, ids_1xS, self.cfg, self.lcfg,
                cache=sub, positions=positions,
            )
            k = [dst.at[slot, :, :bucket].set(sk[0])
                 for dst, sk in zip(cache["k"], sub["k"])]
            v = [dst.at[slot, :, :bucket].set(sv[0])
                 for dst, sv in zip(cache["v"], sub["v"])]
            ln = cache["length"].at[slot].set(length)
            last = logits[0, length - 1]
            return {"k": k, "v": v, "length": ln}, last

        return prefill

    def _make_decode(self):
        # donate the cache: without it XLA inserts a defensive copy of every
        # layer's K/V planes around the aliased in-place decode kernels
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode(params, lora, cache, last_tokens, active, rng):
            rng, sub = jax.random.split(rng)
            logits, cache = forward(
                params, lora, last_tokens[:, None], self.cfg, self.lcfg,
                cache=cache,
            )
            tok = sample_token(sub, logits[:, 0], self.sparams)
            # inactive (free) slots must not advance: pin their length to 0
            cache = dict(
                cache,
                length=jnp.where(active, cache["length"], 0),
            )
            return tok, cache, rng

        return decode

    def _admit(self):
        for slot in range(self.num_slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            prompt = req.prompt[-(self.max_len - req.max_new_tokens):]
            L = len(prompt)
            bucket = next((b for b in self.prefill_buckets if b >= L),
                          self.prefill_buckets[-1])
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :L] = prompt
            self.cache, last = self._prefill(
                self.params, self.lora, self.cache, jnp.asarray(ids),
                jnp.int32(L), slot, bucket,
            )
            self.rng, sub = jax.random.split(self.rng)
            tok = int(sample_token(sub, last[None], self.sparams)[0])
            self._emit(req, tok)
            self.slot_req[slot] = req
            self.last_tokens[slot] = tok
            if req.done:
                self.slot_req[slot] = None

    def _decode_step(self) -> list[Request]:
        active = np.asarray([r is not None for r in self.slot_req])
        toks, self.cache, self.rng = self._decode(
            self.params, self.lora, self.cache,
            jnp.asarray(self.last_tokens), jnp.asarray(active), self.rng,
        )
        toks = np.asarray(toks)
        # ONE device->host transfer for the post-step lengths (a per-slot
        # np.asarray inside the loop cost num_slots syncs per decode step)
        lengths = np.asarray(self.cache["length"])
        finished = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            tok = int(toks[slot])
            self._emit(req, tok)
            self.last_tokens[slot] = tok
            at_cap = int(lengths[slot]) >= self.max_len - 1
            if req.done or at_cap:
                req.done = True
                finished.append(req)
                self.slot_req[slot] = None
        return finished

    def _emit(self, req: Request, tok: int):
        if tok == self.eos_id:
            req.done = True
            return
        req.generated.append(tok)
        if req.on_token:
            req.on_token(req.uid, tok)
        if len(req.generated) >= req.max_new_tokens:
            req.done = True
