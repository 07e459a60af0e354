#!/usr/bin/env python
"""Sweep quantized-matmul kernel block shapes on the real layer dims.

Decode is weight-streaming bound; the kernel should approach the HBM byte
rate (~855 GB/s on this v5e). Measures DEVICE time by chaining dependent
kernel invocations inside one jit (lax.fori_loop whose carry mixes the FULL
output back into the next activations — a column-sliceable dependency would
let XLA dead-code-eliminate most of the matmul) at two loop lengths; the
difference cancels dispatch/fetch round-trip latency. Weights are runtime
ARGUMENTS, not closure constants (constants bloat the HLO past the remote
compiler's request cap and invite folding). The loop bound is traced, so
each row compiles once.

Prints one JSON line per (shape, format, cap) with achieved GB/s.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS_LO, ITERS_HI = 32, 288  # per-iter time = (t_hi - t_lo) / (HI - LO)


def main() -> None:
    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.ops.matmul_q import quantized_matmul
    from adaptive_sd_tpu.ops.quant import quantize_int8, quantize_int4

    shapes = [
        ("7b-qkv", 3584, 4608),
        ("7b-down", 18944, 3584),
        ("72b-qkv", 8192, 10240),
        ("72b-gateup", 8192, 59136),
        ("72b-down", 29568, 8192),
    ]
    M = 8
    rng = np.random.default_rng(0)

    def timed_chain(bits, cap, x0, q, scale, n_bytes, label):
        @functools.partial(jax.jit, static_argnames=("bits", "cap"))
        def chain(x, q, scale, n, *, bits, cap):
            def body(_, carry):
                y = quantized_matmul(
                    carry, q, scale, bits=bits, block_n=cap, block_k=cap
                )
                # FULL-output dependency: mean over all columns feeds the
                # next iteration (a single-column dep would be DCE-sliced)
                return carry + y.mean().astype(carry.dtype) * 1e-30

            return jax.lax.fori_loop(0, n, body, x).sum()

        try:
            ts = {}
            for n in (ITERS_LO, ITERS_HI):
                args = (x0, q, scale, jnp.int32(n))
                jax.device_get(chain(*args, bits=bits, cap=cap))  # warm
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.device_get(chain(*args, bits=bits, cap=cap))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"row": label, "error": str(exc)[:140]}), flush=True)
            return
        per = max(ts[ITERS_HI] - ts[ITERS_LO], 1e-9) / (ITERS_HI - ITERS_LO)
        print(json.dumps({"row": label, "ms": round(per * 1e3, 4),
                          "gbps": round(n_bytes / per / 1e9, 1)}), flush=True)

    for label, K, N in shapes:
        w = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
        for bits in (8, 4):
            qt = quantize_int8(w) if bits == 8 else quantize_int4(w)
            nbytes = qt.q.size * qt.q.dtype.itemsize
            for cap in (512, 1024, 2048):
                timed_chain(bits, cap, x, qt.q, qt.scale, nbytes,
                            f"{label}/int{bits}/cap{cap}")
            del qt
        del w, x


if __name__ == "__main__":
    main()
