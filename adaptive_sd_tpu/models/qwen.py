"""Functional Qwen2-style transformer (RMSNorm / RoPE / GQA / SwiGLU).

Role parity: the model executor the reference gets from vLLM
(``src/serving/real_model_pipeline.py:89-115`` loads Qwen via vLLM). Built
TPU-first as pure functions over a params pytree:

* Linear weights may be raw bf16 arrays or ``QuantizedTensor`` (INT8/INT4) —
  the Pallas dequant-matmul kernels consume the latter on TPU, with an
  identical-math jnp fallback off-TPU (``use_pallas=False``).
* Decode attention reads/writes the paged INT8 KV cache (engine/kv_cache.py);
  prefill uses dense bf16 attention then quantises KV into pages.
* No data-dependent Python control flow: prefill/decode jit once per shape
  bucket; layers are a Python loop at trace time over a per-layer params list
  (each layer's cache buffer aliases in-place under donation — a
  layer-stacked scan carry would force whole-pool dynamic slices instead).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.matmul_q import linear_q
from ..ops.attention import paged_attention, paged_attention_ref, prefill_attention
from ..ops.quant import QuantizedTensor, quantize_int4, quantize_int8, quantize_kv_int8
from .config import ModelSpec

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# building blocks


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def linear(
    x: jax.Array, w, bias=None, *, use_pallas: bool = True, act_quant: bool = False
) -> jax.Array:
    """Dispatch on weight type: QuantizedTensor -> dequant-matmul kernel
    (W8A8 dynamic path when act_quant), raw array -> plain dot."""
    if isinstance(w, QuantizedTensor):
        y = linear_q(x, w, use_pallas=use_pallas, act_quant=act_quant)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def rope_tables(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: [..., head_dim//2] f32."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. x: [..., D]; cos/sin broadcastable to [..., D//2]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# parameter init / quantization


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random init with realistic scales — used for tests and synthetic-weight
    benchmarking (real weights come from models/loader.py)."""
    H, D = spec.hidden, spec.head_dim
    n_q, n_kv, F, V = spec.n_heads, spec.n_kv_heads, spec.ffn, spec.vocab_size
    keys = iter(jax.random.split(key, 6 + spec.n_layers * 7))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)

    params: Params = {
        "embed": dense(next(keys), (V, H), H),
        "final_norm": jnp.ones((H,), dtype),
        "layers": [],
    }
    if not spec.tie_embeddings:
        params["lm_head"] = dense(next(keys), (H, V), H)
    for _ in range(spec.n_layers):
        layer = {
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
            "q_proj": dense(next(keys), (H, n_q * D), H),
            "k_proj": dense(next(keys), (H, n_kv * D), H),
            "v_proj": dense(next(keys), (H, n_kv * D), H),
            "o_proj": dense(next(keys), (n_q * D, H), n_q * D),
            "gate_proj": dense(next(keys), (H, F), H),
            "up_proj": dense(next(keys), (H, F), H),
            "down_proj": dense(next(keys), (F, H), F),
        }
        if spec.attn_bias:
            layer["q_bias"] = jnp.zeros((n_q * D,), dtype)
            layer["k_bias"] = jnp.zeros((n_kv * D,), dtype)
            layer["v_bias"] = jnp.zeros((n_kv * D,), dtype)
        params["layers"].append(layer)
    return params


QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    "qkv_proj", "gateup_proj",
)


def init_params_quantized(
    spec: ModelSpec, key: jax.Array, *, bits: int = 8, fuse: bool = True,
    dtype=jnp.bfloat16,
) -> Params:
    """Random-init + fuse + quantize ONE LAYER AT A TIME so peak device
    memory is O(one raw layer + quantized model), not O(raw model + quantized
    model) — required to stand up large synthetic tiers on a single chip
    (bench.py's 72B-width tiers OOM otherwise)."""
    from ..ops.quant import quantize_int4, quantize_int8

    def quant(w):
        if bits == 16:
            return w
        if bits == 4:
            if w.shape[0] % 256 and w.shape[0] > 256:
                return quantize_int8(w)  # see quantize_model._int4
            gs = 128 if w.shape[0] % 128 == 0 else None
            return quantize_int4(w, group_size=gs)
        return quantize_int8(w)

    H, D = spec.hidden, spec.head_dim
    n_q, n_kv, F, V = spec.n_heads, spec.n_kv_heads, spec.ffn, spec.vocab_size
    keys = iter(jax.random.split(key, 6 + spec.n_layers * 7))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)

    params: Params = {
        "embed": dense(next(keys), (V, H), H),
        "final_norm": jnp.ones((H,), dtype),
        "layers": [],
    }
    if not spec.tie_embeddings:
        params["lm_head"] = quant(dense(next(keys), (H, V), H))
    for _ in range(spec.n_layers):
        layer: dict[str, Any] = {
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
        }
        if fuse:
            layer["qkv_proj"] = quant(dense(next(keys), (H, (n_q + 2 * n_kv) * D), H))
            next(keys), next(keys)  # keep key schedule aligned with init_params
            layer["gateup_proj"] = quant(dense(next(keys), (H, 2 * F), H))
            next(keys)
        else:
            layer["q_proj"] = quant(dense(next(keys), (H, n_q * D), H))
            layer["k_proj"] = quant(dense(next(keys), (H, n_kv * D), H))
            layer["v_proj"] = quant(dense(next(keys), (H, n_kv * D), H))
            layer["gate_proj"] = quant(dense(next(keys), (H, F), H))
            layer["up_proj"] = quant(dense(next(keys), (H, F), H))
        layer["o_proj"] = quant(dense(next(keys), (n_q * D, H), n_q * D))
        layer["down_proj"] = quant(dense(next(keys), (F, H), F))
        if spec.attn_bias:
            if fuse:
                layer["qkv_bias"] = jnp.zeros(((n_q + 2 * n_kv) * D,), dtype)
            else:
                layer["q_bias"] = jnp.zeros((n_q * D,), dtype)
                layer["k_bias"] = jnp.zeros((n_kv * D,), dtype)
                layer["v_bias"] = jnp.zeros((n_kv * D,), dtype)
        params["layers"].append(layer)
    return params


def fuse_projections(params: Params) -> Params:
    """Fuse q/k/v -> one qkv matmul and gate/up -> one gateup matmul per
    layer (7 projection kernels per layer -> 4). Pure re-layout: per-output-
    channel quantization scales are unchanged by concatenation along the
    output dim, so fused-then-quantized equals quantized-then-concatenated
    exactly. Apply BEFORE quantize_model."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        fl = dict(layer)
        fl["qkv_proj"] = jnp.concatenate(
            [layer["q_proj"], layer["k_proj"], layer["v_proj"]], axis=1
        )
        if "q_bias" in layer:
            fl["qkv_bias"] = jnp.concatenate(
                [layer["q_bias"], layer["k_bias"], layer["v_bias"]], axis=0
            )
        fl["gateup_proj"] = jnp.concatenate(
            [layer["gate_proj"], layer["up_proj"]], axis=1
        )
        for k in ("q_proj", "k_proj", "v_proj", "q_bias", "k_bias", "v_bias",
                  "gate_proj", "up_proj"):
            fl.pop(k, None)
        out["layers"].append(fl)
    return out


def quantize_model(
    params: Params, bits: int = 8, quantize_lm_head: bool = True, group_size: int = 128
) -> Params:
    """Offline weight-only quantization pass: every projection matrix becomes
    a QuantizedTensor; embeddings and norms stay bf16 (embedding gather needs
    the table, and norms are tiny). INT4 uses group-wise scales when the
    contraction dim divides ``group_size`` (falls back to per-channel)."""
    import functools as _ft

    def _int4(w):
        if w.shape[0] % 256 and w.shape[0] > 256:
            # No lane-aligned Pallas blocking exists for the packed rows
            # (K/2 % 128 != 0 — in the Qwen family only 72B down_proj,
            # K = 29568): keep this projection INT8 rather than shipping an
            # int4 tensor that silently takes the slow XLA fallback.
            return quantize_int8(w)
        gs = group_size if (group_size and w.shape[0] % group_size == 0) else None
        return quantize_int4(w, group_size=gs)

    quant = quantize_int8 if bits == 8 else _int4
    out = dict(params)
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"])
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for k in QUANT_KEYS:
            if k in layer:
                ql[k] = quant(layer[k])
        out["layers"].append(ql)
    return out



def _embed(params: Params, spec: ModelSpec, tokens: jax.Array, tp_axis) -> jax.Array:
    """Token-embedding gather. Under the shard_map TP path the table is
    vocab-sharded [V/tp, H]: each shard gathers the rows it owns (masked),
    one psum reassembles — exact, since exactly one shard contributes each
    row. Replicated tables take the plain gather."""
    table = params["embed"]
    if tp_axis is not None and table.shape[0] != spec.vocab_size:
        v_loc = table.shape[0]
        loc = tokens - jax.lax.axis_index(tp_axis) * v_loc
        ok = jnp.logical_and(loc >= 0, loc < v_loc)
        rows = jnp.take(table, jnp.clip(loc, 0, v_loc - 1), axis=0)
        return jax.lax.psum(jnp.where(ok[..., None], rows, 0), tp_axis)
    return jnp.take(table, tokens, axis=0)


def _qkv(spec: ModelSpec, layer, x, *, use_pallas: bool, act_quant: bool):
    """Q/K/V projections, fused (qkv_proj) or separate."""
    D = spec.head_dim
    nq, nkv = spec.n_heads * D, spec.n_kv_heads * D
    if "qkv_proj" in layer:
        qkv = linear(x, layer["qkv_proj"], layer.get("qkv_bias"),
                     use_pallas=use_pallas, act_quant=act_quant)
        return qkv[..., :nq], qkv[..., nq : nq + nkv], qkv[..., nq + nkv :]
    q = linear(x, layer["q_proj"], layer.get("q_bias"), use_pallas=use_pallas, act_quant=act_quant)
    k = linear(x, layer["k_proj"], layer.get("k_bias"), use_pallas=use_pallas, act_quant=act_quant)
    v = linear(x, layer["v_proj"], layer.get("v_bias"), use_pallas=use_pallas, act_quant=act_quant)
    return q, k, v


def _row_reduce(x, w, tp_axis, tp_overlap: int, *, use_pallas: bool,
                act_quant: bool):
    """Row-parallel sublayer ending: local matmul + all-reduce over tp_axis.
    ``tp_overlap`` > 1 selects the ppermute-ring collective-matmul overlap
    (parallel/overlap.py) instead of matmul-then-psum."""
    if tp_axis is None:
        return linear(x, w, use_pallas=use_pallas, act_quant=act_quant)
    from ..parallel.overlap import row_parallel_reduce

    return row_parallel_reduce(
        x, w, tp_axis, tp_overlap,
        lambda xx, ww: linear(xx, ww, use_pallas=use_pallas, act_quant=act_quant),
        overlap=tp_overlap > 1,
    )


def _mlp(spec: ModelSpec, layer, x, *, use_pallas: bool, act_quant: bool,
         tp_axis=None, tp_overlap: int = 0):
    """SwiGLU MLP, fused (gateup_proj) or separate. Under TP (tp_axis set and
    spec holding LOCAL head/ffn counts) gate/up are column-parallel, down is
    row-parallel with one psum — the whole sublayer costs one all-reduce
    (or the overlapped ring when ``tp_overlap`` > 1)."""
    if "gateup_proj" in layer:
        gu = linear(x, layer["gateup_proj"], use_pallas=use_pallas, act_quant=act_quant)
        gate, up = gu[..., : spec.ffn], gu[..., spec.ffn :]
    else:
        gate = linear(x, layer["gate_proj"], use_pallas=use_pallas, act_quant=act_quant)
        up = linear(x, layer["up_proj"], use_pallas=use_pallas, act_quant=act_quant)
    return _row_reduce(jax.nn.silu(gate) * up, layer["down_proj"], tp_axis,
                       tp_overlap, use_pallas=use_pallas, act_quant=act_quant)


# ---------------------------------------------------------------------------
# forward passes


def _logits(params: Params, spec: ModelSpec, h: jax.Array, *, use_pallas: bool, act_quant: bool = False) -> jax.Array:
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    if spec.tie_embeddings:
        w = params["embed"]
        return jnp.dot(h, w.T.astype(h.dtype), preferred_element_type=jnp.float32)
    return linear(h, params["lm_head"], use_pallas=use_pallas, act_quant=act_quant).astype(jnp.float32)


def _attn_shapes(spec: ModelSpec, qkv: jax.Array, n_heads: int) -> jax.Array:
    """[..., n*D] -> [..., n, D]"""
    return qkv.reshape(*qkv.shape[:-1], n_heads, spec.head_dim)


def prefill(
    params: Params,
    spec: ModelSpec,
    tokens: jax.Array,      # [B, S] int32 (right-padded)
    seq_lens: jax.Array,    # [B] int32
    cache,                  # engine.kv_cache.PagedKVCache (written in place)
    block_tables: jax.Array,  # [B, max_pages] int32
    *,
    use_pallas: bool = True,
    act_quant: bool = False,
    return_hidden: bool = False,
    tp_axis=None,
    tp_overlap: int = 0,
):
    """Process full prompts; returns (last-token logits [B, V] f32, cache)
    or, with ``return_hidden``, (logits, cache, final hidden states [B, S, H]
    pre-final-norm) — the speculative verifier computes per-position draft
    logits from these (engine/decode.py).

    ``tp_axis``: set when running INSIDE a shard_map tensor-parallel region
    (models/qwen_tp.py). ``spec`` then carries LOCAL head/ffn counts (global
    vocab), params/cache are per-shard views, and each sublayer finishes with
    one psum over the axis; logits come back vocab-sharded."""
    B, S = tokens.shape
    h = _embed(params, spec, tokens, tp_axis)
    positions = jnp.arange(S)[None, :].repeat(B, axis=0)  # [B, S]
    cos, sin = rope_tables(positions, spec.head_dim, spec.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]     # [B, S, 1, half]
    sm_scale = 1.0 / math.sqrt(spec.head_dim)

    for li, layer in enumerate(params["layers"]):
        x = rms_norm(h, layer["input_norm"], spec.rms_eps)
        q, k, v = _qkv(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant)
        q = apply_rope(_attn_shapes(spec, q, spec.n_heads), cos, sin)
        k = apply_rope(_attn_shapes(spec, k, spec.n_kv_heads), cos, sin)
        v = _attn_shapes(spec, v, spec.n_kv_heads)

        attn = prefill_attention(q, k, v, sm_scale=sm_scale, seq_lens=seq_lens)
        attn = attn.reshape(B, S, spec.n_heads * spec.head_dim)
        h = h + _row_reduce(attn, layer["o_proj"], tp_axis, tp_overlap,
                            use_pallas=use_pallas, act_quant=act_quant)

        cache = cache.write_prefill(li, k, v, block_tables, seq_lens)

        x = rms_norm(h, layer["post_norm"], spec.rms_eps)
        h = h + _mlp(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant,
                     tp_axis=tp_axis, tp_overlap=tp_overlap)

    last = jnp.take_along_axis(h, (seq_lens - 1)[:, None, None], axis=1)[:, 0]  # [B, H]
    logits = _logits(params, spec, last, use_pallas=use_pallas, act_quant=act_quant)
    if return_hidden:
        return logits, cache, h
    return logits, cache


def logits_at(params: Params, spec: ModelSpec, h: jax.Array, *, use_pallas: bool = True, act_quant: bool = False):
    """Per-position logits from prefill hidden states (speculative verify)."""
    return _logits(params, spec, h, use_pallas=use_pallas, act_quant=act_quant)


def prefill_window(
    params: Params,
    spec: ModelSpec,
    tokens: jax.Array,        # [B, W] int32 window tokens (right-padded)
    offsets: jax.Array,       # [B] int32 global position of window slot 0
    win_lens: jax.Array,      # [B] int32 valid window lengths
    cache,                    # PagedKVCache (prefix already written)
    block_tables: jax.Array,  # [B, max_pages]
    *,
    use_pallas: bool = True,
    act_quant: bool = False,
    tp_axis=None,
    tp_overlap: int = 0,
):
    """Chunked prefill: process a WINDOW of tokens whose prefix KV is already
    in the cache pages (prefix caching / chunked long-prompt prefill / the
    split verify pass). Each window position attends the cached prefix plus
    the window's own causal prefix via the paged window-attention kernel
    (ops/attention.py paged_window_attention). Returns (hidden [B, W, H]
    pre-final-norm, cache); callers take logits via :func:`logits_at`.

    ``tp_axis``: see :func:`prefill` — shard_map TP mode (spec carries LOCAL
    head/ffn counts; KV pages are head-sharded; one psum per sublayer).

    Role parity: vLLM's chunked-prefill + prefix-caching execution path
    (capabilities the reference rents, SURVEY.md §2.8)."""
    from ..ops.attention import paged_window_attention, paged_window_attention_ref

    B, W = tokens.shape
    h = _embed(params, spec, tokens, tp_axis)
    positions = offsets[:, None] + jnp.arange(W)[None, :]     # [B, W]
    cos, sin = rope_tables(positions, spec.head_dim, spec.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    sm_scale = 1.0 / math.sqrt(spec.head_dim)
    ctx_lens = offsets + win_lens
    attn_fn = paged_window_attention if use_pallas else paged_window_attention_ref
    G = spec.q_group

    for li, layer in enumerate(params["layers"]):
        x = rms_norm(h, layer["input_norm"], spec.rms_eps)
        q, k, v = _qkv(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant)
        q = apply_rope(_attn_shapes(spec, q, spec.n_heads), cos, sin)
        k = apply_rope(_attn_shapes(spec, k, spec.n_kv_heads), cos, sin)
        v = _attn_shapes(spec, v, spec.n_kv_heads)

        # write the window's KV first; attention then reads pages only
        cache = cache.write_window(li, k, v, block_tables, offsets, win_lens)

        # rows w-major within each kv head: [B, W, n_kv, G, D] -> [B, n_kv, W*G, D]
        qr = q.reshape(B, W, spec.n_kv_heads, G, spec.head_dim)
        qr = jnp.swapaxes(qr, 1, 2).reshape(B, spec.n_kv_heads, W * G, spec.head_dim)
        attn = attn_fn(
            qr,
            cache.k_pages[li],
            cache.k_scales[li],
            cache.v_pages[li],
            cache.v_scales[li],
            block_tables,
            ctx_lens,
            offsets,
            group=G,
            sm_scale=sm_scale,
        )
        attn = attn.reshape(B, spec.n_kv_heads, W, G, spec.head_dim)
        attn = jnp.swapaxes(attn, 1, 2).reshape(B, W, spec.n_heads * spec.head_dim)
        h = h + _row_reduce(attn, layer["o_proj"], tp_axis, tp_overlap,
                            use_pallas=use_pallas, act_quant=act_quant)

        x = rms_norm(h, layer["post_norm"], spec.rms_eps)
        h = h + _mlp(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant,
                     tp_axis=tp_axis, tp_overlap=tp_overlap)

    return h, cache


def decode_step(
    params: Params,
    spec: ModelSpec,
    tokens: jax.Array,        # [B] int32 (current input token)
    positions: jax.Array,     # [B] int32 (0-based position of this token)
    cache,                    # PagedKVCache
    block_tables: jax.Array,  # [B, max_pages]
    *,
    use_pallas: bool = True,
    act_quant: bool = False,
    tp_axis=None,
    tp_overlap: int = 0,
):
    """One decode step for the whole batch; returns (logits [B, V] f32, cache).
    ``tp_axis``: see :func:`prefill` — shard_map TP mode."""
    B = tokens.shape[0]
    h = _embed(params, spec, tokens, tp_axis)  # [B, H]
    cos, sin = rope_tables(positions, spec.head_dim, spec.rope_theta)  # [B, half]
    seq_lens = positions + 1
    sm_scale = 1.0 / math.sqrt(spec.head_dim)
    attn_fn = paged_attention if use_pallas else paged_attention_ref

    for li, layer in enumerate(params["layers"]):
        x = rms_norm(h, layer["input_norm"], spec.rms_eps)
        q, k, v = _qkv(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant)
        q = apply_rope(_attn_shapes(spec, q, spec.n_heads), cos[:, None, :], sin[:, None, :])
        k = apply_rope(_attn_shapes(spec, k, spec.n_kv_heads), cos[:, None, :], sin[:, None, :])
        v = _attn_shapes(spec, v, spec.n_kv_heads)  # [B, n_kv, D]

        cache = cache.write_decode(li, k, v, block_tables, positions)

        qg = q.reshape(B, spec.n_kv_heads, spec.q_group, spec.head_dim)
        attn = attn_fn(
            qg,
            cache.k_pages[li],
            cache.k_scales[li],
            cache.v_pages[li],
            cache.v_scales[li],
            block_tables,
            seq_lens,
            sm_scale=sm_scale,
        )
        attn = attn.reshape(B, spec.n_heads * spec.head_dim)
        h = h + _row_reduce(attn, layer["o_proj"], tp_axis, tp_overlap,
                            use_pallas=use_pallas, act_quant=act_quant)

        x = rms_norm(h, layer["post_norm"], spec.rms_eps)
        h = h + _mlp(spec, layer, x, use_pallas=use_pallas, act_quant=act_quant,
                     tp_axis=tp_axis, tp_overlap=tp_overlap)

    return _logits(params, spec, h, use_pallas=use_pallas, act_quant=act_quant), cache
