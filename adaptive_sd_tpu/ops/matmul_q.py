"""Pallas TPU kernels: weight-only INT8 / INT4 dequant + matmul.

This is the decode hot path. Decoding is HBM-bandwidth-bound: every step
streams all weights once, so INT8 halves and INT4 quarters the bytes moved
versus bf16 — the kernel's job is to dequantise *inside* the MXU pipeline so
the speedup is realised instead of being spent on a separate dequant pass.

Role parity: the reference outsources this to vLLM CUDA kernels
(SURVEY.md §2.8 "vLLM CUDA kernels / bf16 dense matmul → Pallas weight-only
INT4/INT8 dequant+matmul kernels").

Design
------
* ``y[M, N] = x[M, K] @ (q[K, N] * scale[N])``, accumulation in f32.
* Grid ``(N/bn, K/bk)`` with the K axis minor: each output tile is revisited
  across K steps and accumulated in a VMEM f32 scratch; scales are applied
  once on the final K step (dequant is algebraically hoisted out of the
  accumulation: x @ (q*s) == (x @ q) * s for per-column scales).
* INT4 weights arrive packed two-per-byte along K (ops/quant.py layout) and
  are unpacked in-kernel with shift ops.
* Wrappers pad M to the bf16 sublane multiple and fall back to a pure-jnp
  reference (same math, XLA-fused) off-TPU, so the engine runs on the CPU
  mesh for tests and dry-runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedTensor, unpack_int4, unpack_int4_halves


def _pick_block(dim: int, cap: int) -> int:
    """Largest divisor of ``dim`` that is a multiple of 128 (TPU lane
    granularity) and <= cap. Divisor-aware rather than power-of-two-only:
    Qwen's non-power-of-two dims (ffn 29568 = 128*231, gateup 59136) would
    otherwise degenerate to 128-wide blocks whose per-grid-step overhead
    dominates the weight stream (measured ~430 vs ~530+ G-elem/s)."""
    if dim % 128:
        return dim  # irregular dim: wrappers fall back to the XLA path
    units = dim // 128
    best = 1
    for u in range(2, min(units, max(cap, 128) // 128) + 1):
        if units % u == 0:
            best = u
    return best * 128


_VMEM_BUDGET = 12 << 20  # leave headroom under the 16 MB scoped limit

_BM_CAP = 512  # M-axis block rows for large-M (prefill/verify) shapes


def _pick_bm(M: int, sub: int) -> tuple[int, int]:
    """(bm, M_pad): M-axis block + padded M. Decode's small M stays a single
    block; prefill/verify M (thousands of rows) blocks at _BM_CAP so bn/bk
    keep their tuned widths instead of shrinking to fit VMEM. At M >= 512
    these matmuls are MXU-bound (4*M flops per weight byte >> the ~480
    flops/byte v5e roofline crossover), so re-streaming weight blocks once
    per M-block hides behind compute."""
    if M <= _BM_CAP:
        M_pad = ((M + sub - 1) // sub) * sub
        return M_pad, M_pad
    M_pad = ((M + _BM_CAP - 1) // _BM_CAP) * _BM_CAP
    return _BM_CAP, M_pad


def _fit_blocks(
    M_pad: int, bn: int, bk: int, N: int, Kq: int, x_itemsize: int,
    two_x_slices: bool, min_bk: int = 128,
) -> tuple[int, int]:
    """Shrink (bn, bk) until the kernel's VMEM footprint fits. The M axis is
    not blocked (decode keeps M small; prefill flattens B*S rows and lands
    here with M in the thousands), so large M must trade against bk/bn.
    Shrinking steps through valid divisors of the dim (see _pick_block), not
    naive halving, so non-power-of-two dims keep lane-aligned blocks."""

    def est(bn_, bk_):
        x = M_pad * bk_ * x_itemsize * 2 * (2 if two_x_slices else 1)
        # int8: packed block double-buffered. int4: the in-kernel unpack
        # materialises lo/hi intermediates on top of the packed stream —
        # measured envelope: (1024,1024) int4 blocks compile, (2048,2048)
        # overflow VMEM; a 6x multiplier reproduces that boundary.
        w = bk_ * bn_ * (6 if two_x_slices else 2)
        acc = M_pad * bn_ * 4
        out = M_pad * bn_ * x_itemsize * 2
        # int4 kernels hold several (M_pad, bn) f32 live temporaries beyond
        # the accumulator (two per-half dot results, scale products, and the
        # grouped kernel's acc read-modify-write copy). Measured on v5e at
        # M_pad=1536: scoped-vmem demand 16.8 MB vs 8.4 MB estimated without
        # this term (bn=256, bk=384) — ~5 extra M x bn f32 buffers closes it.
        # Negligible at decode's small M, so tuned decode blocks are kept.
        tmp = M_pad * bn_ * 4 * (5 if two_x_slices else 0)
        return x + w + acc + out + tmp + bn_ * 8

    while est(bn, bk) > _VMEM_BUDGET and (bn > 128 or bk > min_bk):
        if bk >= bn and bk > min_bk:
            bk = max(_pick_block(Kq, bk // 2), min_bk)
        elif bn > 128:
            bn = _pick_block(N, bn // 2)
        else:
            break
    return bn, bk


def _matmul_int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    # grid is (m-block, n-block, k-block); k innermost accumulates
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:],
        w_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul_int4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc_ref):
    # Split-half int4 layout (ops/quant.py): a packed block's low nibbles are
    # logical K rows [k*bp, (k+1)*bp) and its high nibbles the same range
    # offset by K/2 — contracted against two x slices, no lane interleave.
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = unpack_int4_halves(w_ref[:])  # each (bp, bn) int32
    acc_ref[:] += jnp.dot(
        xlo_ref[:], lo.astype(xlo_ref.dtype), preferred_element_type=jnp.float32
    ) + jnp.dot(
        xhi_ref[:], hi.astype(xhi_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul_int4g_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref,
                         acc_ref, *, gs: int, m: int):
    """Group-wise INT4 with LARGE K blocks: each grid step streams a
    (m*gs, bn) packed block (big DMAs — a gs-pinned block_k of 128 pays
    per-grid-step overhead that measured ~30% slower than weight-only int8)
    and accumulates m per-group sub-dots per half, each scaled by its own
    group scale in f32 AFTER the dot (exact — no bf16 dequant roundtrip).

    Scales arrive as grid-mapped (1, mp, bn) blocks (mp = m padded to the
    sublane multiple; the wrapper reshapes the [n_groups, N] table to
    [nkb, mp, N] per half) — static in-kernel row indexing, no dynamic
    slices (whose sublane-alignment rules reject odd m)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = unpack_int4_halves(w_ref[:])          # each (m*gs, bn)
    acc = acc_ref[:]
    for j in range(m):  # static unroll: m group-aligned sub-dots per half
        sl = slice(j * gs, (j + 1) * gs)
        acc += jnp.dot(
            xlo_ref[:, sl], lo[sl].astype(xlo_ref.dtype),
            preferred_element_type=jnp.float32,
        ) * slo_ref[0, j][None, :].astype(jnp.float32) + jnp.dot(
            xhi_ref[:, sl], hi[sl].astype(xhi_ref.dtype),
            preferred_element_type=jnp.float32,
        ) * shi_ref[0, j][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _finish():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _sublane(dtype) -> int:
    return {jnp.dtype(jnp.float32): 8, jnp.dtype(jnp.bfloat16): 16}.get(jnp.dtype(dtype), 8)


@functools.partial(
    jax.jit, static_argnames=("bits", "block_n", "block_k", "interpret", "out_dtype")
)
def quantized_matmul(
    x: jax.Array,
    q: jax.Array,
    scale: jax.Array,
    *,
    bits: int = 8,
    block_n: int = 2048,
    block_k: int = 2048,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """``x @ dequant(q, scale)`` via the Pallas kernel.

    Default block caps are 2048: the r5 sweep (scripts/kernel_sweep.py)
    measured cap-2048 at or above cap-1024 on every layer shape — 7B qkv
    int8 0.0174 vs 0.0264 ms, 72B rows 748-769 GB/s — and _fit_blocks
    still shrinks to VMEM, so large caps only widen the search.

    x: [M, K] bf16/f32. q: [K, N] int8 (bits=8) or [K//2, N] packed (bits=4).
    scale: [N] f32. Returns [M, N] in ``out_dtype`` (default: x.dtype).
    """
    if x.ndim != 2 or q.ndim != 2:
        raise ValueError(f"expected 2-D x and q, got {x.shape} and {q.shape}")
    M, K = x.shape
    Kq, N = q.shape
    K_logical = Kq * 2 if bits == 4 else Kq
    if K != K_logical:
        raise ValueError(f"K mismatch: x has {K}, q encodes {K_logical}")
    out_dtype = out_dtype or x.dtype
    grouped = bits == 4 and scale.ndim == 2
    if grouped:
        return _quantized_matmul_int4_grouped(
            x, q, scale, interpret=interpret, out_dtype=out_dtype
        )
    # Large-M (prefill/verify) int8 routes to the XLA path: measured on v5e
    # at M=1536 (scripts/prefill_kernel_probe.py), XLA's dequant+dot sustains
    # 185-186 TFLOP/s across every layer shape vs 165-179 for the M-blocked
    # Pallas kernel — the stock gemm pipeline wins once the op is MXU-bound.
    # int4 stays Pallas: it ties XLA at large M and avoids materialising the
    # dequantized bf16 weight; decode (small M) is weight-streaming bound and
    # Pallas wins it outright.
    if bits == 8 and M >= _BM_CAP and not interpret:
        return quantized_matmul_ref(x, q, scale, bits=8, out_dtype=out_dtype)

    if N % 128 or Kq % 128:
        # Irregular dims: no lane-aligned blocking exists (e.g. int4-packed
        # Qwen-72B down_proj, Kq = 29568/2 = 128*115.5) — picking bk == Kq
        # would hand the compiler a whole-K block whose unpack intermediates
        # blow VMEM. Fall back to the XLA reference path.
        return quantized_matmul_ref(x, q, scale, bits=bits, out_dtype=out_dtype)
    bn = _pick_block(N, block_n)
    bk = _pick_block(Kq, block_k)

    sub = _sublane(x.dtype)
    bm, M_pad = _pick_bm(M, sub)
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))

    bn, bk = _fit_blocks(bm, bn, bk, N, Kq, x.dtype.itemsize, two_x_slices=bits == 4)
    if N % bn or Kq % bk:
        return quantized_matmul_ref(x[:M], q, scale, bits=bits, out_dtype=out_dtype)

    nkb = Kq // bk  # K-axis grid size (packed-row blocks for int4)
    grid = (M_pad // bm, N // bn, nkb)
    common_specs = [
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    if bits == 8:
        kernel = _matmul_int8_kernel
        x_specs = [pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)]
    else:
        kernel = _matmul_int4_kernel
        x_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bm, bk), lambda i, j, k: (i, k + nkb), memory_space=pltpu.VMEM
            ),
        ]

    operands = ([x, x] if bits == 4 else [x]) + [q, scale.reshape(1, N)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=x_specs + common_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * K * N,
            bytes_accessed=M_pad * K * x.dtype.itemsize
            + (M_pad // bm) * Kq * N + M_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M]


def _matmul_w8a8_kernel(x_ref, xs_ref, w_ref, ws_ref, o_ref, acc_ref):
    """int8 x int8 -> int32 MXU accumulation; row x col scales on the final
    K step. Measured 447 GB/s weight streaming vs 304 for the weight-only
    int8 kernel on v5e (docs/ARCHITECTURE.md §7)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _finish():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32)
            * xs_ref[:].astype(jnp.float32)
            * ws_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret", "out_dtype")
)
def quantized_matmul_w8a8(
    x: jax.Array,
    q: jax.Array,
    scale: jax.Array,
    *,
    block_n: int = 2048,
    block_k: int = 2048,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """W8A8 dynamic: per-row symmetric INT8 activation quantization feeding
    the native int8 MXU path. Slightly lossier than weight-only (activation
    rounding) but the fastest int8 matmul on this hardware.

    x: [M, K] bf16/f32. q: [K, N] int8 (weight-only INT8 layout). scale: [N].
    """
    if x.ndim != 2 or q.ndim != 2:
        raise ValueError(f"expected 2-D x and q, got {x.shape} and {q.shape}")
    M, K = x.shape
    Kq, N = q.shape
    if K != Kq:
        raise ValueError(f"K mismatch: x has {K}, q has {Kq}")
    out_dtype = out_dtype or x.dtype

    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)

    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    if N % bn or K % bk:
        acc = jax.lax.dot_general(
            xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs * scale[None, :].astype(jnp.float32)).astype(
            out_dtype
        )

    bm, M_pad = _pick_bm(M, 32)  # int8 sublane multiple
    if M_pad != M:
        xq = jnp.pad(xq, ((0, M_pad - M), (0, 0)))
        xs = jnp.pad(xs, ((0, M_pad - M), (0, 0)), constant_values=1.0)

    bn, bk = _fit_blocks(bm, bn, bk, N, K, 1, two_x_slices=False)
    if N % bn or K % bk:
        acc = jax.lax.dot_general(
            xq[:M], q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs[:M] * scale[None, :].astype(jnp.float32)).astype(
            out_dtype
        )

    out = pl.pallas_call(
        _matmul_w8a8_kernel,
        grid=(M_pad // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, xs.astype(jnp.float32), q, scale.reshape(1, N).astype(jnp.float32))
    return out[:M]


def _quantized_matmul_int4_grouped(x, q, scale, *, interpret, out_dtype,
                                   block_n: int = 1024, block_k: int = 1024):
    """Pallas path for group-wise INT4 (scale [K/gs, N]); block_k is a
    MULTIPLE of the group size (m groups per grid step — see kernel)."""
    M, K = x.shape
    Kq, N = q.shape
    n_groups = scale.shape[0]
    gs = K // n_groups
    if Kq % gs or N % 128 or Kq % 128 or gs % 128 or gs > Kq:
        return quantized_matmul_ref(x, q, scale, bits=4, out_dtype=out_dtype)
    bn = _pick_block(N, block_n)
    bk = _pick_block(Kq, block_k)
    bk = max((bk // gs) * gs, gs)          # group-aligned K block
    if Kq % bk:
        bk = gs
    sub = _sublane(x.dtype)
    bm, M_pad = _pick_bm(M, sub)
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    bn, bk = _fit_blocks(bm, bn, bk, N, Kq, x.dtype.itemsize,
                         two_x_slices=True, min_bk=gs)
    bk = max((bk // gs) * gs, gs)
    if N % bn or Kq % bk:
        return quantized_matmul_ref(x[:M], q, scale, bits=4, out_dtype=out_dtype)
    m = bk // gs
    nkb = Kq // bk
    mp = ((m + 7) // 8) * 8  # sublane-padded scale rows per block
    # per-half scale tables reshaped to grid-mapped (nkb, mp, N) blocks
    g_half = n_groups // 2
    s32 = scale.astype(jnp.float32)
    s_lo = jnp.pad(s32[:g_half].reshape(nkb, m, N), ((0, 0), (0, mp - m), (0, 0)))
    s_hi = jnp.pad(s32[g_half:].reshape(nkb, m, N), ((0, 0), (0, mp - m), (0, 0)))
    kernel = functools.partial(_matmul_int4g_kernel, gs=gs, m=m)
    out = pl.pallas_call(
        kernel,
        grid=(M_pad // bm, N // bn, nkb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k + nkb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, q, s_lo, s_hi)
    return out[:M]


def quantized_matmul_ref(
    x: jax.Array, q: jax.Array, scale: jax.Array, *, bits: int = 8, out_dtype=None
) -> jax.Array:
    """Pure-jnp reference: identical math, XLA-compiled. Used for kernel
    correctness tests and as the off-TPU fallback."""
    out_dtype = out_dtype or x.dtype
    w = q if bits == 8 else unpack_int4(q)
    if bits == 4 and scale.ndim == 2:  # group-wise: dequantise then matmul
        K, N = w.shape
        gs = K // scale.shape[0]
        wf = (
            w.astype(jnp.float32).reshape(-1, gs, N) * scale[:, None, :].astype(jnp.float32)
        ).reshape(K, N)
        acc = jnp.dot(x.astype(jnp.float32), wf, preferred_element_type=jnp.float32)
        return acc.astype(out_dtype)
    acc = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * scale[None, :].astype(jnp.float32)).astype(out_dtype)


def linear_q(
    x: jax.Array, t: QuantizedTensor, *, use_pallas: bool = True, act_quant: bool = False
) -> jax.Array:
    """Apply a quantized linear layer to activations of any leading shape.

    ``act_quant``: use the W8A8 dynamic path (int8 activations, native int8
    MXU) — fastest on v5e; only valid for bits=8 weights.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if act_quant and t.bits == 8 and use_pallas:
        # the Pallas path needs a TPU; off-TPU the wrapper's XLA int8 fallback
        # is reached via interpret-incompatible dims check, so route directly
        y = quantized_matmul_w8a8(x2, t.q, t.scale, interpret=not on_tpu())
    else:
        fn = quantized_matmul if use_pallas else quantized_matmul_ref
        y = fn(x2, t.q, t.scale, bits=t.bits)
    return y.reshape(*lead, t.out_features)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False
