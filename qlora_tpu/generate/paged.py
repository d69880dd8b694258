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


class PagedPool:
    """Physical page pool + free-list allocator."""

    def __init__(self, cfg: ModelConfig, n_pages: int, page_size: int = 16,
                 max_pages_per_seq: int = 64):
        L, KVH, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        self.page_size = page_size
        self.max_pages_per_seq = max_pages_per_seq
        self.k_pages = jnp.zeros((L, KVH, n_pages, page_size, hd), jnp.bfloat16)
        self.v_pages = jnp.zeros((L, KVH, n_pages, page_size, hd), jnp.bfloat16)
        self.free: list[int] = list(range(n_pages))
        self.tables: dict[int, list[int]] = {}   # uid → page ids

    @property
    def n_free(self) -> int:
        return len(self.free)

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def allocate(self, uid: int, n_tokens: int) -> list[int]:
        need = self.pages_needed(n_tokens)
        if need > len(self.free):
            raise MemoryError(
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
                    raise MemoryError("page pool exhausted")
                self.tables[uid].append(self.free.pop())

    def release(self, uid: int) -> None:
        self.free.extend(self.tables.pop(uid, ()))

    def table_array(self, uids: list[int]) -> jnp.ndarray:
        """[len(uids), max_pages_per_seq] int32, padded with page 0."""
        out = np.zeros((len(uids), self.max_pages_per_seq), np.int32)
        for i, uid in enumerate(uids):
            pages = self.tables.get(uid, [])
            out[i, : len(pages)] = pages
        return jnp.asarray(out)

    def write_prefill(self, uid: int, k: jax.Array, v: jax.Array) -> None:
        """Scatter a prompt's contiguous KV [L, T, KVH, hd] into uid's pages."""
        L, T, KVH, hd = k.shape
        P = self.page_size
        self.extend(uid, T)
        pages = self.tables[uid]
        pad = self.pages_needed(T) * P - T
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # [L, np_used, P, KVH, hd] → [L, KVH, np_used, P, hd]
        kp = jnp.transpose(kp.reshape(L, -1, P, KVH, hd), (0, 3, 1, 2, 4))
        vp = jnp.transpose(vp.reshape(L, -1, P, KVH, hd), (0, 3, 1, 2, 4))
        idx = jnp.asarray(pages[: kp.shape[2]], jnp.int32)
        self.k_pages = self.k_pages.at[:, :, idx].set(kp.astype(jnp.bfloat16))
        self.v_pages = self.v_pages.at[:, :, idx].set(vp.astype(jnp.bfloat16))

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
        self.k_pages = cache["k_pages"]
        self.v_pages = cache["v_pages"]
