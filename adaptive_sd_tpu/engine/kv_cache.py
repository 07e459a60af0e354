"""Paged INT8 KV cache: device-side page pools + functional writers.

Role parity: vLLM's paged KV cache (SURVEY.md §2.8). The reference's own
"KVCacheManager" (src/serving/cache_manager.py) actually stores text outputs;
here the real thing: per-layer page pools of quantized KV with per-(token,
head) scales, written functionally (in-place under jit donation), read by the
Pallas paged-attention kernel via per-sequence block tables.

Layout per layer:
  k_pages  [n_kv, n_pages, page_size, head_dim]  int8
  k_scales [n_kv, n_pages, 1, page_size]         f32
(the scale layout is lane-aligned for the kernel's [1, page] scale blocks).

Page 0..n_pages-1 are allocator-managed (engine/allocator.py); out-of-range
scatter indices are dropped, which is how padding positions are masked.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.config import ModelSpec
from ..ops.quant import quantize_kv_int8


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    k_pages: list[jax.Array]
    k_scales: list[jax.Array]
    v_pages: list[jax.Array]
    v_scales: list[jax.Array]

    def tree_flatten(self):
        return (self.k_pages, self.k_scales, self.v_pages, self.v_scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape props ---------------------------------------------------------
    @property
    def n_layers(self) -> int:
        return len(self.k_pages)

    @property
    def n_pages(self) -> int:
        return self.k_pages[0].shape[1]

    @property
    def page_size(self) -> int:
        return self.k_pages[0].shape[2]

    def memory_bytes(self) -> int:
        return sum(
            x.size * x.dtype.itemsize
            for arrs in (self.k_pages, self.k_scales, self.v_pages, self.v_scales)
            for x in arrs
        )

    # -- constructors --------------------------------------------------------
    @classmethod
    def create(cls, spec: ModelSpec, n_pages: int, page_size: int = 128) -> "PagedKVCache":
        n_kv, D = spec.n_kv_heads, spec.head_dim
        k_pages, k_scales, v_pages, v_scales = [], [], [], []
        for _ in range(spec.n_layers):
            k_pages.append(jnp.zeros((n_kv, n_pages, page_size, D), jnp.int8))
            k_scales.append(jnp.zeros((n_kv, n_pages, 1, page_size), jnp.float32))
            v_pages.append(jnp.zeros((n_kv, n_pages, page_size, D), jnp.int8))
            v_scales.append(jnp.zeros((n_kv, n_pages, 1, page_size), jnp.float32))
        return cls(k_pages, k_scales, v_pages, v_scales)

    # -- functional writers --------------------------------------------------
    def write_decode(
        self,
        layer: int,
        k: jax.Array,             # [B, n_kv, D] bf16/f32
        v: jax.Array,             # [B, n_kv, D]
        block_tables: jax.Array,  # [B, max_pages] int32
        positions: jax.Array,     # [B] int32 — position being written
    ) -> "PagedKVCache":
        B, n_kv, _ = k.shape
        page = self.page_size
        kq, ks = quantize_kv_int8(k)  # [B, n_kv, D], [B, n_kv]
        vq, vs = quantize_kv_int8(v)
        page_idx = jnp.take_along_axis(block_tables, (positions // page)[:, None], axis=1)[:, 0]
        slot = positions % page
        h_idx = jnp.broadcast_to(jnp.arange(n_kv)[None, :], (B, n_kv))
        pi = jnp.broadcast_to(page_idx[:, None], (B, n_kv))
        sl = jnp.broadcast_to(slot[:, None], (B, n_kv))
        zero = jnp.zeros_like(pi)

        new = self._copy()
        new.k_pages[layer] = self.k_pages[layer].at[h_idx, pi, sl].set(kq, mode="drop")
        new.k_scales[layer] = self.k_scales[layer].at[h_idx, pi, zero, sl].set(ks, mode="drop")
        new.v_pages[layer] = self.v_pages[layer].at[h_idx, pi, sl].set(vq, mode="drop")
        new.v_scales[layer] = self.v_scales[layer].at[h_idx, pi, zero, sl].set(vs, mode="drop")
        return new

    def write_prefill(
        self,
        layer: int,
        k: jax.Array,             # [B, S, n_kv, D]
        v: jax.Array,             # [B, S, n_kv, D]
        block_tables: jax.Array,  # [B, max_pages]
        seq_lens: jax.Array,      # [B] — positions >= seq_len are dropped
    ) -> "PagedKVCache":
        B, S, n_kv, _ = k.shape
        page = self.page_size
        kq, ks = quantize_kv_int8(k)  # [B, S, n_kv, D], [B, S, n_kv]
        vq, vs = quantize_kv_int8(v)
        pos = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        valid = pos < seq_lens[:, None]
        page_idx = jnp.take_along_axis(block_tables, pos // page, axis=1)  # [B, S]
        # invalid positions -> out-of-range page, dropped by the scatter
        page_idx = jnp.where(valid, page_idx, self.n_pages)
        slot = pos % page

        h_idx = jnp.broadcast_to(jnp.arange(n_kv)[None, None, :], (B, S, n_kv))
        pi = jnp.broadcast_to(page_idx[:, :, None], (B, S, n_kv))
        sl = jnp.broadcast_to(slot[:, :, None], (B, S, n_kv))
        zero = jnp.zeros_like(pi)

        new = self._copy()
        new.k_pages[layer] = self.k_pages[layer].at[h_idx, pi, sl].set(kq, mode="drop")
        new.k_scales[layer] = self.k_scales[layer].at[h_idx, pi, zero, sl].set(ks, mode="drop")
        new.v_pages[layer] = self.v_pages[layer].at[h_idx, pi, sl].set(vq, mode="drop")
        new.v_scales[layer] = self.v_scales[layer].at[h_idx, pi, zero, sl].set(vs, mode="drop")
        return new

    def write_window(
        self,
        layer: int,
        k: jax.Array,             # [B, W, n_kv, D]
        v: jax.Array,             # [B, W, n_kv, D]
        block_tables: jax.Array,  # [B, max_pages]
        offsets: jax.Array,       # [B] first global position of the window
        win_lens: jax.Array,      # [B] valid window lengths (rest dropped)
    ) -> "PagedKVCache":
        """Write a mid-sequence token window (chunked prefill / speculative
        verify over a cached prefix): position of window slot w is
        ``offsets + w``. Same drop-masking as write_prefill."""
        B, W, n_kv, _ = k.shape
        page = self.page_size
        kq, ks = quantize_kv_int8(k)
        vq, vs = quantize_kv_int8(v)
        w_idx = jnp.broadcast_to(jnp.arange(W)[None, :], (B, W))
        pos = offsets[:, None] + w_idx
        valid = w_idx < win_lens[:, None]
        page_idx = jnp.take_along_axis(block_tables, pos // page, axis=1)  # [B, W]
        page_idx = jnp.where(valid, page_idx, self.n_pages)
        slot = pos % page

        h_idx = jnp.broadcast_to(jnp.arange(n_kv)[None, None, :], (B, W, n_kv))
        pi = jnp.broadcast_to(page_idx[:, :, None], (B, W, n_kv))
        sl = jnp.broadcast_to(slot[:, :, None], (B, W, n_kv))
        zero = jnp.zeros_like(pi)

        new = self._copy()
        new.k_pages[layer] = self.k_pages[layer].at[h_idx, pi, sl].set(kq, mode="drop")
        new.k_scales[layer] = self.k_scales[layer].at[h_idx, pi, zero, sl].set(ks, mode="drop")
        new.v_pages[layer] = self.v_pages[layer].at[h_idx, pi, sl].set(vq, mode="drop")
        new.v_scales[layer] = self.v_scales[layer].at[h_idx, pi, zero, sl].set(vs, mode="drop")
        return new

    def _copy(self) -> "PagedKVCache":
        return PagedKVCache(
            list(self.k_pages), list(self.k_scales), list(self.v_pages), list(self.v_scales)
        )
