"""GSPMD sharding rules for model params, KV cache, and activations.

Role parity: vLLM's Megatron-style tensor parallelism + NCCL all-reduce
(SURVEY.md §2.8) — here expressed as ``PartitionSpec`` annotations per weight;
XLA inserts the (ICI) collectives. Layout follows the classic column-/row-
parallel pairing so each transformer block needs exactly one all-reduce per
sublayer:

  q/k/v/gate/up : [H, out]  -> shard out over tp (column-parallel)
  o/down        : [in, H]   -> shard in  over tp (row-parallel, psum output)
  embed         : [V, H]    -> shard V over tp (gather is cheap)
  lm_head       : [H, V]    -> shard V over tp
  KV pages      : [n_kv, P, page, D] -> shard n_kv over tp when divisible

QuantizedTensor shards q and scale together on the same named axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelSpec
from ..ops.quant import QuantizedTensor
from .mesh import AXIS_TP


def _spec_for(w, col_or_row: str, tp: int):
    """PartitionSpec for a (possibly quantized) 2-D weight.

    col: shard last dim; row: shard first dim. Quantized scales follow the
    output-channel dim (always the last), so they shard only for 'col'.
    """
    if col_or_row == "col":
        wspec, sspec = P(None, AXIS_TP), P(AXIS_TP)
    elif col_or_row == "row":
        wspec, sspec = P(AXIS_TP, None), P(None)
    else:
        raise ValueError(col_or_row)
    if isinstance(w, QuantizedTensor):
        return QuantizedTensor(q=wspec, scale=sspec, bits=w.bits)
    return wspec


def param_specs(params: dict, spec: ModelSpec, tp: int) -> dict:
    """Pytree of PartitionSpec mirroring the params structure."""

    def divisible(dim: int) -> bool:
        return tp > 1 and dim % tp == 0

    out: dict[str, Any] = {
        # embed [V, H]: shard vocab (row) — the gather all-gathers only the
        # hit rows; lm_head column-shards vocab for the big final matmul.
        "embed": P(AXIS_TP, None) if divisible(spec.vocab_size) else P(None, None),
        "final_norm": P(None),
        "layers": [],
    }
    if "lm_head" in params:
        out["lm_head"] = _spec_for(params["lm_head"], "col", tp)
    # column-parallel (shard output dim) vs row-parallel (shard input dim);
    # fused qkv/gateup are column-parallel like their unfused constituents.
    COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "qkv_proj", "gateup_proj")
    ROW = ("o_proj", "down_proj")
    for layer in params["layers"]:
        lo: dict[str, Any] = {"input_norm": P(None), "post_norm": P(None)}
        for key in COL:
            if key in layer:
                lo[key] = _spec_for(layer[key], "col", tp)
        for key in ROW:
            if key in layer:
                lo[key] = _spec_for(layer[key], "row", tp)
        for key in ("q_bias", "k_bias", "v_bias", "qkv_bias"):
            if key in layer:
                lo[key] = P(AXIS_TP)
        out["layers"].append(lo)
    return out


def cache_specs(spec: ModelSpec, tp: int) -> Any:
    """Specs for PagedKVCache: shard the kv-head dim over tp when divisible,
    else replicate (GQA kv-head counts are small)."""
    if tp > 1 and spec.n_kv_heads % tp == 0:
        page_spec = P(AXIS_TP, None, None, None)
        scale_spec = P(AXIS_TP, None, None, None)
    else:
        page_spec = P(None, None, None, None)
        scale_spec = P(None, None, None, None)
    from ..engine.kv_cache import PagedKVCache

    n = spec.n_layers
    return PagedKVCache(
        k_pages=[page_spec] * n,
        k_scales=[scale_spec] * n,
        v_pages=[page_spec] * n,
        v_scales=[scale_spec] * n,
    )


def _to_named(tree_specs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree_specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, spec: ModelSpec, mesh: Mesh) -> dict:
    """device_put the params tree onto the mesh per param_specs."""
    tp = mesh.shape[AXIS_TP]
    shardings = _to_named(param_specs(params, spec, tp), mesh)
    return jax.device_put(params, shardings)


def shard_cache(cache, spec: ModelSpec, mesh: Mesh):
    tp = mesh.shape[AXIS_TP]
    shardings = _to_named(cache_specs(spec, tp), mesh)
    return jax.device_put(cache, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Requests (tokens, tables, seq_lens) shard their batch dim over the
    data-parallel axes — (dcn, dp) on multi-host meshes, dp otherwise."""
    from .mesh import AXIS_DCN, AXIS_DP

    if AXIS_DCN in mesh.axis_names:
        return NamedSharding(mesh, P((AXIS_DCN, AXIS_DP)))
    return NamedSharding(mesh, P(AXIS_DP))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
