"""shard_map tensor-parallel full-model forward.

Role parity: vLLM's Megatron-style TP executor (the reference rents it,
SURVEY.md §2.8). The plain-GSPMD path (parallel/sharding.py) works but cannot
auto-partition `pallas_call`, so multi-device tiers previously fell back to
the jnp kernels. Here the WHOLE transformer forward runs inside one
`jax.shard_map` over the ``tp`` mesh axis, so every matmul hits the Pallas
quantized kernels per shard and each sublayer costs exactly one psum
(column-parallel qkv/gate/up, row-parallel o/down — the classic pairing):

  embed   [V/tp, H]  masked-gather + psum (exact: one owner per row)
  qkv     [H, (nq+2nkv)D/tp]  local heads; attention fully local per shard
  o_proj  [nqD/tp, H]  local matmul + psum
  gate/up [H, 2F/tp], down [F/tp, H] + psum
  KV pages [n_kv/tp, P, page, D]  — paged-attention kernel on local heads
  lm_head [H, V/tp]   logits come back vocab-sharded (sampling runs GSPMD)

Two layout transforms make naive contiguous sharding shard-LOCAL (applied
once at prep time, `prepare_tp_params`):

* **Fused-projection interleave**: fused qkv/gateup concatenate blocks along
  the output dim, but a contiguous column shard of the concatenation mixes
  whole blocks across shards (shard 0 would own all of `gate`). Columns are
  permuted to [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] so shard s's contiguous
  slice is exactly its own (q,k,v)/(gate,up) sub-blocks; per-output-channel
  quantization scales permute identically (pure re-layout, exact).
* **INT4 row repack**: pack_int4 pairs rows (k, k+K/2) into one byte
  (split-half), so contiguous sharding of PACKED rows mixes K-blocks across
  shards. Row-parallel int4 weights are unpacked, split into per-shard K
  blocks, and repacked per shard, making each shard's packed block
  self-contained.
"""

from __future__ import annotations

import dataclasses
import functools
from types import SimpleNamespace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quant import QuantizedTensor, pack_int4, unpack_int4
from ..parallel.mesh import AXIS_TP
from .config import ModelSpec
from . import qwen

COL_KEYS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
            "qkv_proj", "gateup_proj")
ROW_KEYS = ("o_proj", "down_proj")
BIAS_KEYS = ("q_bias", "k_bias", "v_bias", "qkv_bias")


# ---------------------------------------------------------------------------
# compatibility gate


def tp_compatible(spec: ModelSpec, params: dict, tp: int) -> bool:
    """Whether the shard_map TP path supports this (spec, params, tp)."""
    if tp <= 1:
        return False
    if spec.n_heads % tp or spec.n_kv_heads % tp or spec.ffn % tp:
        return False
    if spec.vocab_size % tp:
        return False
    # int4 row-parallel weights need even local K and shard-aligned groups
    for layer in params["layers"]:
        for key in ROW_KEYS:
            w = layer.get(key)
            if isinstance(w, QuantizedTensor) and w.bits == 4:
                K = w.q.shape[0] * 2
                k_loc = K // tp
                if K % tp or k_loc % 2:
                    return False
                if w.scale.ndim == 2 and w.scale.shape[0] % tp:
                    return False
    lm = params.get("lm_head")
    if isinstance(lm, QuantizedTensor) and lm.bits == 4 and lm.scale.ndim == 2:
        # lm_head is column-parallel; grouped scales shard on channels — fine
        pass
    return True


def local_spec(spec: ModelSpec, tp: int) -> ModelSpec:
    """Per-shard architecture view: local head/ffn counts, GLOBAL vocab (the
    embed gather masks by ownership; see qwen._embed)."""
    return dataclasses.replace(
        spec,
        name=f"{spec.name}-tp{tp}",
        n_heads=spec.n_heads // tp,
        n_kv_heads=spec.n_kv_heads // tp,
        ffn=spec.ffn // tp,
    )


# ---------------------------------------------------------------------------
# layout transforms


def _fused_perm(block_sizes: tuple[int, ...], tp: int) -> np.ndarray:
    """Column permutation turning [A|B|C] into [A_0 B_0 C_0 | A_1 B_1 C_1 |…]
    so a contiguous 1/tp column shard holds its own sub-blocks."""
    offs = np.cumsum([0, *block_sizes[:-1]])
    pieces = []
    for s in range(tp):
        for off, size in zip(offs, block_sizes):
            loc = size // tp
            pieces.append(np.arange(off + s * loc, off + (s + 1) * loc))
    return np.concatenate(pieces)


def _permute_out_channels(w, perm: np.ndarray):
    """Apply an output-channel permutation to a weight (raw or quantized)."""
    idx = jnp.asarray(perm)
    if isinstance(w, QuantizedTensor):
        return QuantizedTensor(
            q=w.q[:, idx],
            scale=w.scale[..., idx],  # per-channel [N] or grouped [K/gs, N]
            bits=w.bits,
        )
    return w[:, idx]


def _repack_int4_rows(t: QuantizedTensor, tp: int) -> QuantizedTensor:
    """Re-layout a row-parallel packed-int4 weight so each contiguous packed
    row shard unpacks to its own K block (see module docstring)."""
    full = unpack_int4(t.q)                     # [K, N] int8
    K = full.shape[0]
    k_loc = K // tp
    blocks = [pack_int4(full[s * k_loc : (s + 1) * k_loc]) for s in range(tp)]
    return QuantizedTensor(q=jnp.concatenate(blocks, axis=0), scale=t.scale, bits=4)


def transform_params_for_tp(params: dict, spec: ModelSpec, tp: int) -> dict:
    """Pure layout pass (host/device, one-time): fused-column interleave +
    int4 row repack. Numerically exact re-layouts."""
    D = spec.head_dim
    qkv_sizes = (spec.n_heads * D, spec.n_kv_heads * D, spec.n_kv_heads * D)
    gu_sizes = (spec.ffn, spec.ffn)
    qkv_perm = _fused_perm(qkv_sizes, tp)
    gu_perm = _fused_perm(gu_sizes, tp)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        if "qkv_proj" in nl:
            nl["qkv_proj"] = _permute_out_channels(nl["qkv_proj"], qkv_perm)
            if "qkv_bias" in nl:
                nl["qkv_bias"] = nl["qkv_bias"][jnp.asarray(qkv_perm)]
        if "gateup_proj" in nl:
            nl["gateup_proj"] = _permute_out_channels(nl["gateup_proj"], gu_perm)
        for key in ROW_KEYS:
            w = nl.get(key)
            if isinstance(w, QuantizedTensor) and w.bits == 4:
                nl[key] = _repack_int4_rows(w, tp)
        out["layers"].append(nl)
    return out


# ---------------------------------------------------------------------------
# PartitionSpecs (rank-aware, shard_map-exact)


def _w_spec(w, kind: str, axis: str):
    """Spec for a (possibly quantized) weight. ``kind``: 'col' shards the
    output dim, 'row' the contraction dim. Scale specs follow rank:
    per-channel scales [N] live on the output dim; grouped int4 scales
    [K/gs, N] follow (K, N)."""
    if kind == "col":
        q = P(None, axis)
        if isinstance(w, QuantizedTensor):
            s = P(axis) if w.scale.ndim == 1 else P(None, axis)
            return QuantizedTensor(q=q, scale=s, bits=w.bits)
        return q
    q = P(axis, None)
    if isinstance(w, QuantizedTensor):
        s = P() if w.scale.ndim == 1 else P(axis, None)
        return QuantizedTensor(q=q, scale=s, bits=w.bits)
    return q


def tp_param_specs(params: dict, spec: ModelSpec, axis: str = AXIS_TP) -> dict:
    out: dict[str, Any] = {
        "embed": P(axis, None),
        "final_norm": P(),
    }
    if "lm_head" in params:
        out["lm_head"] = _w_spec(params["lm_head"], "col", axis)
    layers = []
    for layer in params["layers"]:
        lo: dict[str, Any] = {"input_norm": P(), "post_norm": P()}
        for key in COL_KEYS:
            if key in layer:
                lo[key] = _w_spec(layer[key], "col", axis)
        for key in ROW_KEYS:
            if key in layer:
                lo[key] = _w_spec(layer[key], "row", axis)
        for key in BIAS_KEYS:
            if key in layer:
                lo[key] = P(axis)
        layers.append(lo)
    out["layers"] = layers
    return out


def tp_cache_specs(cache, axis: str = AXIS_TP):
    """KV pages and scales both lead with the head dim — shard it."""
    from ..engine.kv_cache import PagedKVCache

    n = len(cache.k_pages)
    s = P(axis, None, None, None)
    return PagedKVCache(
        k_pages=[s] * n, k_scales=[s] * n, v_pages=[s] * n, v_scales=[s] * n
    )


def _named(tree, mesh: Mesh):
    return jax.tree.map(
        lambda p: NamedSharding(mesh, p), tree, is_leaf=lambda x: isinstance(x, P)
    )


def prepare_tp_params(params: dict, spec: ModelSpec, mesh: Mesh,
                      axis: str = AXIS_TP) -> dict:
    """Layout-transform + device_put onto the mesh with the exact shardings
    the shard_map in_specs expect (no resharding at dispatch)."""
    tp = mesh.shape[axis]
    params = transform_params_for_tp(params, spec, tp)
    return jax.device_put(params, _named(tp_param_specs(params, spec, axis), mesh))


def shard_cache_tp(cache, mesh: Mesh, axis: str = AXIS_TP):
    return jax.device_put(cache, _named(tp_cache_specs(cache, axis), mesh))


# ---------------------------------------------------------------------------
# forward


def make_tp_forward(
    spec: ModelSpec,
    mesh: Mesh,
    *,
    axis: str = AXIS_TP,
    use_pallas: bool = True,
    act_quant: bool = False,
    overlap_collectives: bool = False,
) -> SimpleNamespace:
    """Build (prefill, decode_step, logits_at) with the qwen.py signatures,
    each running the whole model inside one shard_map over ``axis``. Params
    must come from :func:`prepare_tp_params`, the cache from
    :func:`shard_cache_tp`. Data args (tokens/lens/tables) are replicated
    across the mesh; logits return vocab-sharded (GSPMD finishes sampling).

    ``overlap_collectives``: run the row-parallel sublayer endings as
    ppermute-ring collective matmuls (parallel/overlap.py) instead of
    matmul-then-psum, hiding the all-reduce under the chunked compute.
    DECODE ONLY: prefill/prefill_window payloads are [B, S, N], where the
    zero-padded psum reassembly would multiply ICI traffic by tp and the
    tp-1 serialized hops sit on a compute-bound path — prefill keeps the
    plain matmul-then-psum ending regardless of the flag."""
    tp = mesh.shape[axis]
    lspec = local_spec(spec, tp)
    tp_overlap = tp if overlap_collectives else 0

    def prefill_fn(params, _spec, tokens, seq_lens, cache, block_tables,
                   return_hidden: bool = False):
        pspecs = tp_param_specs(params, spec, axis)
        cspecs = tp_cache_specs(cache, axis)
        out_specs = (P(None, axis), cspecs) + ((P(),) if return_hidden else ())

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(pspecs, P(), P(), cspecs, P()),
            out_specs=out_specs,
        )
        def run(params_l, tokens, seq_lens, cache_l, tables):
            return qwen.prefill(
                params_l, lspec, tokens, seq_lens, cache_l, tables,
                use_pallas=use_pallas, act_quant=act_quant,
                return_hidden=return_hidden, tp_axis=axis,
                tp_overlap=0,  # ring is decode-only (see docstring)
            )

        return run(params, tokens, seq_lens, cache, block_tables)

    def decode_fn(params, _spec, tokens, positions, cache, block_tables):
        pspecs = tp_param_specs(params, spec, axis)
        cspecs = tp_cache_specs(cache, axis)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(pspecs, P(), P(), cspecs, P()),
            out_specs=(P(None, axis), cspecs),
        )
        def run(params_l, tokens, positions, cache_l, tables):
            return qwen.decode_step(
                params_l, lspec, tokens, positions, cache_l, tables,
                use_pallas=use_pallas, act_quant=act_quant, tp_axis=axis,
                tp_overlap=tp_overlap,
            )

        return run(params, tokens, positions, cache, block_tables)

    def logits_at_fn(params, _spec, h):
        """Per-position logits from (replicated) hidden states [B, W, H]."""
        pspecs = tp_param_specs(params, spec, axis)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(pspecs, P()),
            out_specs=P(None, None, axis),
        )
        def run(params_l, h_l):
            return qwen.logits_at(
                params_l, lspec, h_l, use_pallas=use_pallas, act_quant=act_quant
            )

        return run(params, h)

    def prefill_window_fn(params, _spec, tokens_w, offsets, win_lens, cache,
                          block_tables):
        """Prefix-cache / chunked-prefill window pass under TP: each shard
        processes its local heads over the window; the returned hidden
        states are replicated (every sublayer ends in a psum)."""
        pspecs = tp_param_specs(params, spec, axis)
        cspecs = tp_cache_specs(cache, axis)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(pspecs, P(), P(), P(), cspecs, P()),
            out_specs=(P(), cspecs),
        )
        def run(params_l, tokens_w, offsets, win_lens, cache_l, tables):
            return qwen.prefill_window(
                params_l, lspec, tokens_w, offsets, win_lens, cache_l, tables,
                use_pallas=use_pallas, act_quant=act_quant, tp_axis=axis,
                tp_overlap=0,  # ring is decode-only (see docstring)
            )

        return run(params, tokens_w, offsets, win_lens, cache, block_tables)

    return SimpleNamespace(
        prefill=prefill_fn, decode_step=decode_fn, logits_at=logits_at_fn,
        prefill_window=prefill_window_fn, tp=tp
    )
