#!/usr/bin/env python
"""Probe large-M (prefill/verify) quantized-matmul performance on device.

Decode (M ~ 8) is weight-streaming bound; prefill/verify (M in the
thousands) is MXU bound, and the Pallas kernels must keep wide blocks via
M-axis grid blocking rather than shrinking block_n to fit VMEM
(ops/matmul_q._pick_bm). This prints device-true ms + effective TFLOP/s for
the Pallas path vs the XLA reference (dequant + dot) per format, at the
cascade's real verify shapes.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS_LO, ITERS_HI = 4, 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.ops.matmul_q import quantized_matmul, quantized_matmul_ref
    from adaptive_sd_tpu.ops.quant import quantize_int4, quantize_int8

    shapes = [
        ("7b-down", 18944, 3584),
        ("32b-down", 27648, 5120),
        ("72b-qkv", 8192, 10240),
        ("72b-down", 29568, 8192),
    ]
    M = int(os.environ.get("PROBE_M", "1536"))
    rng = np.random.default_rng(0)

    def run(fn, label, flops):
        @jax.jit
        def chain(x, n):
            def body(_, carry):
                y = fn(carry)
                return carry + y.mean().astype(carry.dtype) * 1e-30

            return jax.lax.fori_loop(0, n, body, x).sum()

        try:
            ts = {}
            for n in (ITERS_LO, ITERS_HI):
                jax.device_get(chain(x, jnp.int32(n)))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.device_get(chain(x, jnp.int32(n)))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"row": label, "error": str(exc)[:160]}), flush=True)
            return
        per = max(ts[ITERS_HI] - ts[ITERS_LO], 1e-9) / (ITERS_HI - ITERS_LO)
        print(json.dumps({"row": label, "ms": round(per * 1e3, 3),
                          "tflops": round(flops / per / 1e12, 1)}), flush=True)

    for label, K, N in shapes:
        w = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
        flops = 2 * M * K * N
        for fmt, qt in (
            ("int8", quantize_int8(w)),
            ("int4", quantize_int4(w)),
            ("int4g", quantize_int4(w, group_size=128)),
        ):
            run(functools.partial(quantized_matmul, q=qt.q, scale=qt.scale,
                                  bits=8 if fmt == "int8" else 4),
                f"{label}/{fmt}/pallas/M{M}", flops)
            run(functools.partial(quantized_matmul_ref, q=qt.q, scale=qt.scale,
                                  bits=8 if fmt == "int8" else 4),
                f"{label}/{fmt}/xla-ref/M{M}", flops)
            del qt
        del w, x


if __name__ == "__main__":
    main()
