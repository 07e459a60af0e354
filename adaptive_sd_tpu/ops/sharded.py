"""shard_map-wrapped Pallas kernels: tensor-parallel quantized linears.

Under plain GSPMD, a `pallas_call` cannot be auto-partitioned, so multi-device
engines fall back to the jnp path. These wrappers run the Pallas kernel
*per shard* with `jax.shard_map` and explicit collectives — the production
multi-chip compute path (Megatron pairing):

* column-parallel: weight [K, N/tp] per device, x replicated → local kernel,
  output stays N-sharded. No collective.
* row-parallel: weight [K/tp, N] per device, x K-sharded → local kernel,
  `psum` over tp to finish the contraction.

One column+row pair per transformer sublayer ⇒ exactly one all-reduce, which
XLA routes over ICI. Off-TPU the kernels run in interpret mode so the same
code paths test on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .matmul_q import on_tpu, quantized_matmul, quantized_matmul_ref
from .quant import QuantizedTensor


def _local_matmul(x, q, scale, bits):
    if on_tpu():
        return quantized_matmul(x, q, scale, bits=bits)
    return quantized_matmul_ref(x, q, scale, bits=bits)


def shard_weight_column(t: QuantizedTensor, mesh: Mesh, axis: str = "tp") -> QuantizedTensor:
    """Place a quantized weight column-sharded (output dim) on the mesh."""
    return QuantizedTensor(
        q=jax.device_put(t.q, NamedSharding(mesh, P(None, axis))),
        scale=jax.device_put(t.scale, NamedSharding(mesh, P(axis))),
        bits=t.bits,
    )


def shard_weight_row(t: QuantizedTensor, mesh: Mesh, axis: str = "tp") -> QuantizedTensor:
    """Place a quantized weight row-sharded (contraction dim) on the mesh.
    For packed INT4 the packed rows are K/2, so K-sharding shards the packed
    dim identically (split-half layout keeps halves within a shard only if
    tp divides K/2 — enforced here)."""
    return QuantizedTensor(
        q=jax.device_put(t.q, NamedSharding(mesh, P(axis, None))),
        scale=jax.device_put(t.scale, NamedSharding(mesh, P(None))),
        bits=t.bits,
    )


def tp_linear_column(
    x: jax.Array, t: QuantizedTensor, mesh: Mesh, axis: str = "tp"
) -> jax.Array:
    """x [M, K] replicated; weight column-sharded; returns [M, N] N-sharded."""
    bits = t.bits

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis)),
        out_specs=P(None, axis),
    )
    def run(x_l, q_l, s_l):
        return _local_matmul(x_l, q_l, s_l, bits)

    return run(x, t.q, t.scale)


def tp_linear_row(
    x: jax.Array, t: QuantizedTensor, mesh: Mesh, axis: str = "tp"
) -> jax.Array:
    """x [M, K] K-sharded (e.g. the output of a column-parallel layer);
    weight row-sharded; psum finishes the contraction → [M, N] replicated."""
    bits = t.bits

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P(None)),
        out_specs=P(),
    )
    def run(x_l, q_l, s_l):
        # scales are per-output-channel: correct to apply per shard, psum after
        partial = _local_matmul(x_l, q_l, s_l, bits)
        return jax.lax.psum(partial, axis)

    return run(x, t.q, t.scale)


def tp_mlp_block(
    x: jax.Array,
    gate: QuantizedTensor,
    up: QuantizedTensor,
    down: QuantizedTensor,
    mesh: Mesh,
    axis: str = "tp",
) -> jax.Array:
    """The classic fused pair: gate/up column-parallel, silu*mul on the shard,
    down row-parallel with one psum — a whole SwiGLU MLP with a single
    all-reduce and every matmul on the Pallas kernels."""
    bits = gate.bits

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, axis), P(axis),
            P(None, axis), P(axis),
            P(axis, None), P(None),
        ),
        out_specs=P(),
    )
    def run(x_l, gq, gs, uq, us, dq, ds):
        g = _local_matmul(x_l, gq, gs, bits)
        u = _local_matmul(x_l, uq, us, bits)
        h = jax.nn.silu(g) * u
        return jax.lax.psum(_local_matmul(h, dq, ds, bits), axis)

    return run(x, gate.q, gate.scale, up.q, up.scale, down.q, down.scale)
