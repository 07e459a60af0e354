"""Attention kernels: paged decode attention over INT8 KV + prefill attention.

Role parity: vLLM's paged-attention CUDA kernels + paged KV cache
(SURVEY.md §2.8 "vLLM paged KV cache + continuous batching → Pallas paged
INT8 KV-cache kernels"). Built TPU-first:

* KV lives in HBM as fixed-size pages ``[n_pages, page_size, n_kv_heads, D]``
  int8 with per-(token, head) scales; per-sequence block tables map logical
  positions to pages (engine/kv_cache.py owns allocation).
* The decode kernel runs one grid step per (batch, kv_head, page) with the
  block table as a *scalar-prefetch* operand, so the page index feeds the
  BlockSpec index_map and Pallas DMAs exactly the pages each sequence needs.
  Softmax is computed flash-style (running max / normaliser in VMEM scratch)
  across the page grid dimension.
* GQA is native: q carries ``[group]`` query heads per kv head and the
  whole group shares one page stream.

The jnp reference implements identical math for correctness tests and CPU
runs (tests/test_ops.py asserts exact agreement in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] int32
    seq_lens_ref,      # [B] int32
    # blocks
    q_ref,     # [1, 1, G, D]
    k_ref,     # [1, 1, page, D] int8
    ks_ref,    # [1, 1, 1, page] f32
    v_ref,     # [1, 1, page, D] int8
    vs_ref,    # [1, 1, 1, page] f32
    o_ref,     # [1, 1, G, D]
    # scratch
    m_ref,     # [G, 128] f32   running max (lane-broadcast)
    l_ref,     # [G, 128] f32   running normaliser
    acc_ref,   # [G, D] f32     running weighted values
    *,
    page_size: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_pages = pl.num_programs(2)

    seq_len = seq_lens_ref[b]
    valid_page = j * page_size < seq_len

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(valid_page)
    def _page():
        q = q_ref[0, 0].astype(jnp.float32)                      # [G, D]
        k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0, 0][:, None]  # [page, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale                                             # [G, page]
        pos = j * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < seq_len, s, NEG_INF)

        # m/l scratch are lane-broadcast [G, 128]; a lane-reduce max reads the
        # scalar back without relying on single-lane slicing support.
        m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)        # [G, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)                # [G, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                          # rescale old state
        p = jnp.exp(s - m_new)                                   # [G, page]

        v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0, 0][:, None]  # [page, D]
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        l_new = jnp.max(l_ref[:], axis=1, keepdims=True) * alpha + jnp.sum(
            p, axis=1, keepdims=True
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_pages - 1)
    def _finish():
        l = jnp.max(l_ref[:], axis=1, keepdims=True)
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paged_attention(
    q: jax.Array,            # [B, n_kv, G, D] bf16/f32
    k_pages: jax.Array,      # [n_kv, n_pages, page, D] int8
    k_scales: jax.Array,     # [n_kv, n_pages, 1, page] f32
    v_pages: jax.Array,      # [n_kv, n_pages, page, D] int8
    v_scales: jax.Array,     # [n_kv, n_pages, 1, page] f32
    block_tables: jax.Array, # [B, max_pages] int32
    seq_lens: jax.Array,     # [B] int32
    *,
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Flash decode attention over paged INT8 KV. Returns [B, n_kv, G, D]."""
    B, n_kv, G, D = q.shape
    _, n_pages_total, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    # Schedulers park idle lanes on an out-of-range sentinel page (writes are
    # dropped); reads must stay in range for the kernel's DMA, and the
    # seq_len mask discards whatever the clamped page contains.
    block_tables = jnp.clip(block_tables, 0, n_pages_total - 1)

    def table(b, h, j, bt_ref, sl_ref):
        # Clamp to a valid page for out-of-range steps; the kernel masks them.
        return bt_ref[b, j]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_kv, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, D), lambda b, h, j, bt, sl: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, page_size, D),
                lambda b, h, j, bt, sl: (h, table(b, h, j, bt, sl), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, page_size),
                lambda b, h, j, bt, sl: (h, table(b, h, j, bt, sl), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, D),
                lambda b, h, j, bt, sl: (h, table(b, h, j, bt, sl), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, page_size),
                lambda b, h, j, bt, sl: (h, table(b, h, j, bt, sl), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, j, bt, sl: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel, page_size=page_size, sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, seq_lens, q, k_pages, k_scales, v_pages, v_scales)


def paged_attention_ref(
    q, k_pages, k_scales, v_pages, v_scales, block_tables, seq_lens, *, sm_scale
) -> jax.Array:
    """Pure-jnp reference (gather + masked softmax), identical math."""
    B, n_kv, G, D = q.shape
    _, n_pages_total, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    block_tables = jnp.clip(block_tables, 0, n_pages_total - 1)
    L = max_pages * page_size

    # Gather pages per sequence: [B, n_kv, L, D]
    def gather(pages, scales):
        g = pages[:, block_tables]                   # [n_kv, B, maxp, page, D]
        s = scales[:, block_tables]                  # [n_kv, B, maxp, 1, page]
        g = jnp.swapaxes(g, 0, 1).reshape(B, n_kv, L, D).astype(jnp.float32)
        s = jnp.swapaxes(s, 0, 1).reshape(B, n_kv, L)
        return g * s[..., None]

    k = gather(k_pages, k_scales)
    v = gather(v_pages, v_scales)
    scores = jnp.einsum("bhgd,bhld->bhgl", q.astype(jnp.float32), k) * sm_scale
    pos = jnp.arange(L)[None, None, None, :]
    scores = jnp.where(pos < seq_lens[:, None, None, None], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgl,bhld->bhgd", w, v)
    return out.astype(q.dtype)


def _window_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] int32
    ctx_lens_ref,      # [B] int32 — offsets + window lengths
    offsets_ref,       # [B] int32 — global position of window row 0
    # blocks
    q_ref,     # [1, 1, W*G, D]
    k_ref,     # [1, 1, page, D] int8
    ks_ref,    # [1, 1, 1, page] f32
    v_ref,     # [1, 1, page, D] int8
    vs_ref,    # [1, 1, 1, page] f32
    o_ref,     # [1, 1, W*G, D]
    # scratch
    m_ref,     # [W*G, 128] f32
    l_ref,     # [W*G, 128] f32
    acc_ref,   # [W*G, D] f32
    *,
    page_size: int,
    sm_scale: float,
    group: int,
):
    """Flash attention for a WINDOW of query positions over paged INT8 KV —
    the chunked-prefill / prefix-cache-reuse kernel. Row r = w*group + g is
    query position offsets[b] + w; it attends keys at positions <= its own
    (per-row causal mask), which covers both the cached prefix and the
    window itself (the window's KV is written to the pages first)."""
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_pages = pl.num_programs(2)

    ctx_len = ctx_lens_ref[b]
    off = offsets_ref[b]
    valid_page = j * page_size < ctx_len

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(valid_page)
    def _page():
        q = q_ref[0, 0].astype(jnp.float32)                      # [W*G, D]
        k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0, 0][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale                                             # [W*G, page]
        key_pos = j * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        q_pos = off + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // group
        s = jnp.where(key_pos <= q_pos, s, NEG_INF)

        m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0, 0][:, None]
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        l_new = jnp.max(l_ref[:], axis=1, keepdims=True) * alpha + jnp.sum(
            p, axis=1, keepdims=True
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_pages - 1)
    def _finish():
        l = jnp.max(l_ref[:], axis=1, keepdims=True)
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "sm_scale", "interpret"))
def paged_window_attention(
    q: jax.Array,            # [B, n_kv, W*G, D] — rows w-major within head
    k_pages: jax.Array,      # [n_kv, n_pages, page, D] int8
    k_scales: jax.Array,     # [n_kv, n_pages, 1, page] f32
    v_pages: jax.Array,      # [n_kv, n_pages, page, D] int8
    v_scales: jax.Array,     # [n_kv, n_pages, 1, page] f32
    block_tables: jax.Array, # [B, max_pages] int32
    ctx_lens: jax.Array,     # [B] int32 — offsets + window length
    offsets: jax.Array,      # [B] int32
    *,
    group: int,
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Windowed flash attention over paged INT8 KV (chunked prefill /
    speculative verify over a cached prefix). Returns [B, n_kv, W*G, D]."""
    B, n_kv, WG, D = q.shape
    _, n_pages_total, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    block_tables = jnp.clip(block_tables, 0, n_pages_total - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_kv, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, WG, D), lambda b, h, j, bt, cl, of: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, D),
                lambda b, h, j, bt, cl, of: (h, bt[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, page_size),
                lambda b, h, j, bt, cl, of: (h, bt[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, D),
                lambda b, h, j, bt, cl, of: (h, bt[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, page_size),
                lambda b, h, j, bt, cl, of: (h, bt[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, WG, D), lambda b, h, j, bt, cl, of: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WG, 128), jnp.float32),
            pltpu.VMEM((WG, 128), jnp.float32),
            pltpu.VMEM((WG, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _window_kernel, page_size=page_size, sm_scale=sm_scale, group=group
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, WG, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, ctx_lens, offsets, q, k_pages, k_scales, v_pages, v_scales)


def paged_window_attention_ref(
    q, k_pages, k_scales, v_pages, v_scales, block_tables, ctx_lens, offsets,
    *, group, sm_scale
) -> jax.Array:
    """Pure-jnp reference: gather + per-row causal masked softmax."""
    B, n_kv, WG, D = q.shape
    _, n_pages_total, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    block_tables = jnp.clip(block_tables, 0, n_pages_total - 1)
    L = max_pages * page_size

    def gather(pages, scales):
        g = pages[:, block_tables]
        s = scales[:, block_tables]
        g = jnp.swapaxes(g, 0, 1).reshape(B, n_kv, L, D).astype(jnp.float32)
        s = jnp.swapaxes(s, 0, 1).reshape(B, n_kv, L)
        return g * s[..., None]

    k = gather(k_pages, k_scales)
    v = gather(v_pages, v_scales)
    scores = jnp.einsum("bhrd,bhld->bhrl", q.astype(jnp.float32), k) * sm_scale
    key_pos = jnp.arange(L)[None, None, None, :]
    q_pos = (offsets[:, None] + jnp.arange(WG)[None, :] // group)[:, None, :, None]
    scores = jnp.where(key_pos <= q_pos, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrl,bhld->bhrd", w, v)
    return out.astype(q.dtype)


def prefill_attention(
    q: jax.Array,   # [B, S, n_heads, D]
    k: jax.Array,   # [B, S, n_kv, D]
    v: jax.Array,   # [B, S, n_kv, D]
    *,
    sm_scale: float,
    seq_lens: jax.Array | None = None,  # [B] actual lengths (rest is padding)
) -> jax.Array:
    """Causal prefill attention (GQA) via jax.nn.dot_product_attention —
    XLA's fused flash path, no materialised S x S scores. The einsum
    reference below (prefill_attention_ref) is the correctness oracle."""
    try:
        return jax.nn.dot_product_attention(
            q,
            k,
            v,
            scale=sm_scale,
            is_causal=True,
            query_seq_lengths=seq_lens,
            key_value_seq_lengths=seq_lens,
        )
    except (ValueError, TypeError):
        # GQA/backend combination unsupported: fall back to the reference.
        return prefill_attention_ref(q, k, v, sm_scale=sm_scale, seq_lens=seq_lens)


def prefill_attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: float,
    seq_lens: jax.Array | None = None,
) -> jax.Array:
    """Masked-softmax einsum reference for prefill attention."""
    B, S, H, D = q.shape
    n_kv = k.shape[2]
    group = H // n_kv
    qg = q.reshape(B, S, n_kv, group, D)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores * sm_scale
    pos = jnp.arange(S)
    causal = pos[None, :] <= pos[:, None]  # [S_q, S_kv] allow j <= i
    mask = causal[None, None, None]
    if seq_lens is not None:
        valid = pos[None, :] < seq_lens[:, None]            # [B, S]
        mask = mask & valid[:, None, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", w, v.astype(jnp.float32))
    return out.reshape(B, S, H, D).astype(q.dtype)
