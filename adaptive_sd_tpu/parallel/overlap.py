"""Collective-matmul overlap: ring all-reduce interleaved with chunked matmuls.

TPU-native latency-hiding for the two all-reduces in the tensor-parallel
transformer sublayers (SURVEY.md §7 "ICI collectives overlapped with verify
matmuls"; the reference rents the equivalent from vLLM/NCCL and never touches
it — there is no reference code for this, only the capability).

The baseline TP sublayer is ``psum(linear(x, W_row))``: one big local matmul,
then one exposed all-reduce. XLA already makes the psum *asynchronous*, but it
can only overlap it with ops that come AFTER it in program order — and the
residual add that consumes the psum result is immediately next, so in decode
the all-reduce latency sits on the critical path.

Here the output dim N is split into ``tp`` chunks and the all-reduce is
decomposed into its reduce-scatter half, expressed as a ``tp - 1``-hop
unidirectional ring of ``ppermute`` hops, each interleaved with the NEXT
chunk's local matmul:

  step 0:  shard s computes its partial of chunk (s+1) mod tp
  step t:  acc (for chunk (s+1-t) mod tp) arrives from shard s-1 over ICI
           WHILE shard s computes its own partial of that chunk; add.
  end:     shard s holds the fully-reduced chunk (s+2) mod tp; a final
           all-gather (XLA's, async) replicates the N outputs.

Per-step matmul reads [K, N/tp] of the weight, so total HBM traffic equals
the baseline's one full-weight read; the ppermute payloads are activations
([B, N/tp] in decode — tiny). The ring hop and the chunk matmul are
independent per step, which is exactly the shape XLA's async collective
scheduler can overlap (the matmul issues while the permute is in flight).

Exactness: the same per-shard partial sums, re-associated (float addition
order differs from psum's reduction tree, so agreement is to reassociation
tolerance, not bitwise) — tested vs the psum path and the single-device
reference for bf16/int8/int4 weights on the virtual mesh
(tests/test_overlap.py). Enable via
``make_tp_forward(..., overlap_collectives=True)``.

Perf status: single-chip environment — exactness-tested on the CPU mesh, not
yet timed on a real multi-chip slice (docs/ARCHITECTURE.md §7 caveat).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.quant import QuantizedTensor


def _out_dim(w) -> int:
    """Output (N) dim of a raw or quantized weight (int4 packs K, not N)."""
    q = w.q if isinstance(w, QuantizedTensor) else w
    return q.shape[-1]


def _slice_out(w, lo, size: int):
    """Slice ``size`` output channels starting at (traced) ``lo``."""
    if isinstance(w, QuantizedTensor):
        q = lax.dynamic_slice_in_dim(w.q, lo, size, axis=1)
        if w.scale.ndim == 1:  # per-channel [N]
            s = lax.dynamic_slice_in_dim(w.scale, lo, size, axis=0)
        else:  # grouped [K/gs, N]
            s = lax.dynamic_slice_in_dim(w.scale, lo, size, axis=1)
        return QuantizedTensor(q=q, scale=s, bits=w.bits)
    return lax.dynamic_slice_in_dim(w, lo, size, axis=1)


def overlap_compatible(w, tp: int) -> bool:
    """Whether the ring path supports this weight at this tp.

    Grouped-int4 scales are fine (sliced on N). The only structural
    requirement is N % tp == 0 so chunks are equal static shapes.
    """
    return tp > 1 and _out_dim(w) % tp == 0


def ring_row_parallel(
    x: jax.Array,
    w,
    axis: str,
    tp: int,
    linear_fn: Callable,
) -> jax.Array:
    """psum(linear_fn(x, W_local)) via a compute-overlapped ppermute ring.

    Must run INSIDE a shard_map region over ``axis`` (size ``tp``).
    ``linear_fn(x, w_chunk) -> [..., chunk]`` is the local matmul (the
    engine passes ops.matmul_q.linear_q configured for the tier's format).
    Returns the fully-reduced [..., N] output, replicated across the axis
    (same partial sums as ``psum``, ring-order association).
    """
    actual = lax.axis_size(axis)
    if tp != actual:
        # chunk indexing and the hop count derive from ``tp`` while ppermute
        # uses the real axis — a mismatch would produce silently wrong sums
        raise ValueError(
            f"ring_row_parallel: caller tp={tp} != shard_map axis "
            f"{axis!r} size {actual}"
        )
    N = _out_dim(w)
    c = N // tp
    me = lax.axis_index(axis)
    perm = [(s, (s + 1) % tp) for s in range(tp)]

    def chunk_partial(t: int) -> jax.Array:
        j = jnp.mod(me + 1 - t, tp)  # chunk this shard contributes at step t
        return linear_fn(x, _slice_out(w, j * c, c))

    # reduce-scatter ring: hop t carries the accumulator for the chunk this
    # shard is about to add — the ppermute and the chunk matmul are
    # independent, so the collective hides under the compute.
    acc = chunk_partial(0)
    for t in range(1, tp):
        acc = lax.ppermute(acc, axis, perm)
        acc = acc + chunk_partial(t)

    # shard s now owns the fully-reduced chunk (s + 2) % tp. Reassembly:
    # place the owned chunk at its position and psum — exactly one shard
    # contributes each chunk, so this is an all-gather in psum clothing.
    # (shard_map's replication checker cannot prove lax.all_gather output
    # replicated, but psum it can; the payloads here are decode activations,
    # so the extra zeros on the wire are noise next to the hop latency.)
    j_own = jnp.mod(me + 2, tp)
    out = jnp.zeros((*acc.shape[:-1], N), acc.dtype)
    out = lax.dynamic_update_slice_in_dim(out, acc, j_own * c, axis=-1)
    return lax.psum(out, axis)


def row_parallel_reduce(
    x: jax.Array,
    w,
    axis: Optional[str],
    tp: int,
    linear_fn: Callable,
    *,
    overlap: bool = False,
) -> jax.Array:
    """The row-parallel sublayer ending: overlapped ring when enabled and
    supported, XLA psum otherwise. ``axis=None`` (single-device) is a plain
    local matmul."""
    if axis is None:
        return linear_fn(x, w)
    if overlap and overlap_compatible(w, tp):
        return ring_row_parallel(x, w, axis, tp, linear_fn)
    return lax.psum(linear_fn(x, w), axis)
