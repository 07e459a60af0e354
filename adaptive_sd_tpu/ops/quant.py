"""Weight & KV quantization: symmetric per-channel INT8 and packed INT4.

Role parity: the reference gets quantization from bitsandbytes INT8
(``src/training/generate_training_data.py:64-70``) and vLLM's CUDA kernels;
here it is an explicit offline pass producing packed integer arrays + scales
that the Pallas dequant-matmul kernels (ops/matmul_q.py) consume.

Conventions
-----------
* Weights are stored ``[K, N]`` (in_features x out_features); quantization is
  symmetric per output channel (axis N): ``w ≈ q * scale[n]``.
* INT4 packs two values per int8 byte in a *split-half* layout:
  ``byte[k, n] = (q[k, n] & 0xF) | (q[k + K/2, n] << 4)`` for ``k < K/2``.
  Split-half (rather than interleaved pairs) keeps the in-kernel unpack to two
  int32 shifts and lets the matmul kernel contract the lo/hi halves against
  two slices of ``x`` — no lane interleave, which Mosaic cannot vectorise.
* KV-cache INT8 uses per-(token, head) scales — see ops/attention.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """Packed integer payload + dequant scales.

    Registered as a pytree with ``bits`` as static aux data: bit-width drives
    kernel dispatch (int8 vs int4 kernels have different signatures), so it
    must stay a Python int under jit tracing, while q/scale flow as arrays.
    """

    q: jax.Array          # int8; [K, N] for int8, [K//2, N] for packed int4
    scale: jax.Array      # float32 [N]
    bits: int             # 8 or 4

    def tree_flatten(self):
        return (self.q, self.scale), self.bits

    @classmethod
    def tree_unflatten(cls, bits, children):
        return cls(q=children[0], scale=children[1], bits=bits)

    @property
    def out_features(self) -> int:
        return self.q.shape[-1]

    @property
    def in_features(self) -> int:
        k = self.q.shape[0]
        return k * 2 if self.bits == 4 else k


def quantize_int8(w: jax.Array, axis: int = 0) -> QuantizedTensor:
    """Symmetric per-channel INT8: scale = max|w| / 127 along ``axis``
    (the contraction axis K, so each output channel n has its own scale)."""
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale.reshape(-1).astype(jnp.float32), bits=8)


def dequantize_int8(t: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    assert t.bits == 8
    return (t.q.astype(jnp.float32) * t.scale[None, :]).astype(dtype)


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] along axis 0, split-half layout:
    ``out[k, n] = (q[k, n] & 0xF) | (q[k + K/2, n] << 4)``. K must be even."""
    if q.shape[0] % 2:
        raise ValueError(f"K must be even to pack int4, got {q.shape[0]}")
    half = q.shape[0] // 2
    lo = q[:half].astype(jnp.int32) & 0xF
    hi = (q[half:].astype(jnp.int32) & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_halves(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sign-extended (lo_half, hi_half) int32 of a packed block. All
    arithmetic is int32 — Mosaic vectorises i32 shifts but not i8 ones — so
    this same code runs inside Pallas kernels."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28        # low nibble, sign-extended
    hi = p >> 4                 # high nibble (arithmetic shift keeps sign)
    return lo, hi


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4`: [K/2, N] packed -> [K, N] int8."""
    lo, hi = unpack_int4_halves(packed)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def quantize_int4(w: jax.Array, axis: int = 0, group_size=None) -> QuantizedTensor:
    """Symmetric INT4 (range [-8, 7]) packed two-per-byte.

    ``group_size``: scales per (K-group, output channel) instead of per
    channel — cuts reconstruction error ~3x (13% -> ~4% on gaussian weights)
    for 2 extra bytes per group of 128 rows. Scale shape becomes [K/gs, N].
    """
    w = jnp.asarray(w)
    if group_size is None:
        amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
        scale = jnp.maximum(amax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(w / scale), -8, 7).astype(jnp.int8)
        return QuantizedTensor(
            q=pack_int4(q), scale=scale.reshape(-1).astype(jnp.float32), bits=4
        )
    K, N = w.shape
    if K % group_size:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    wg = w.reshape(K // group_size, group_size, N)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)                     # [K/gs, 1, N]
    q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int8).reshape(K, N)
    return QuantizedTensor(
        q=pack_int4(q), scale=scale[:, 0, :].astype(jnp.float32), bits=4
    )


def dequantize_int4(t: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    assert t.bits == 4
    q = unpack_int4(t.q).astype(jnp.float32)
    if t.scale.ndim == 2:  # group-wise [K/gs, N]
        K, N = q.shape
        gs = K // t.scale.shape[0]
        return (q.reshape(-1, gs, N) * t.scale[:, None, :]).reshape(K, N).astype(dtype)
    return (q * t.scale[None, :]).astype(dtype)


def dequantize(t: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    return dequantize_int8(t, dtype) if t.bits == 8 else dequantize_int4(t, dtype)


def quantization_error(w: jax.Array, t: QuantizedTensor) -> float:
    """Relative Frobenius reconstruction error — sanity metric for the
    offline pass (int8 should land ~1e-2, int4 ~5e-2 on gaussian weights)."""
    w32 = jnp.asarray(w, jnp.float32)
    err = jnp.linalg.norm(w32 - dequantize(t, jnp.float32)) / jnp.maximum(
        jnp.linalg.norm(w32), 1e-12
    )
    return float(err)


def quantize_kv_int8(kv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(…, head) symmetric INT8 for KV cache entries.

    ``kv``: [..., head_dim] float; returns (q int8 same shape,
    scale float32 [...] without the trailing head_dim axis).
    """
    amax = jnp.max(jnp.abs(kv), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(kv / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_kv_int8(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


def quantize_params_tree(params, bits: int = 8, min_size: int = 1 << 16):
    """Offline pass over a params pytree: every 2-D leaf with >= min_size
    elements becomes a QuantizedTensor; everything else (embeddings excluded
    by callers, norms, biases) stays in bf16."""
    quant = quantize_int8 if bits == 8 else quantize_int4

    def visit(leaf):
        if isinstance(leaf, (jnp.ndarray, np.ndarray)) and leaf.ndim == 2 and leaf.size >= min_size:
            return quant(leaf)
        return leaf

    return jax.tree.map(visit, params)
