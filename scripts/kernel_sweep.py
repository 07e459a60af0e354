#!/usr/bin/env python
"""Sweep quantized-matmul kernel block shapes on the real layer dims.

Decode is weight-streaming bound; the kernel should approach the HBM byte
rate (~855 GB/s on this v5e). Measures DEVICE time by chaining ``ITERS``
data-dependent kernel invocations inside one jit (a lax.fori_loop whose
carry feeds the next iteration's activations) and fetching a scalar — the
only reliable method through the axon tunnel, where per-call
``block_until_ready`` does not actually synchronise device execution.

Prints one JSON line per (shape, format, cap) with achieved GB/s, plus a
bf16-dot control row per shape (the roofline calibration).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 32


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
        ("7b-gateup", 3584, 37888),
        ("7b-down", 18944, 3584),
        ("72b-qkv", 8192, 10240),
        ("72b-gateup", 8192, 59136),
        ("72b-down", 29568, 8192),
    ]
    M = 8
    rng = np.random.default_rng(0)

    def timed_chain(call, x0, n_bytes, label):
        """call(x) -> y [M, N]; chain ITERS dependent invocations."""

        @jax.jit
        def chain(x):
            def body(_, carry):
                y = call(carry)
                # data dependency: next activations perturbed by this output
                return carry + y[:, :1].astype(carry.dtype) * 1e-30

            return jax.lax.fori_loop(0, ITERS, body, x).sum()

        try:
            jax.device_get(chain(x0))  # compile + warm
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                jax.device_get(chain(x0))
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"row": label, "error": str(exc)[:140]}), flush=True)
            return
        per = best / ITERS
        print(json.dumps({"row": label, "ms": round(per * 1e3, 4),
                          "gbps": round(n_bytes / per / 1e9, 1)}), flush=True)

    for label, K, N in shapes:
        w = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)

        # control: plain bf16 dot (XLA) — the roofline reference
        timed_chain(lambda c, w=w: jnp.dot(c, w), x, K * N * 2,
                    f"{label}/bf16-xla")

        for bits in (8, 4):
            qt = quantize_int8(w) if bits == 8 else quantize_int4(w)
            nbytes = qt.q.size * qt.q.dtype.itemsize
            for cap in (512, 1024, 2048, 4096):
                call = functools.partial(
                    quantized_matmul, q=qt.q, scale=qt.scale, bits=bits,
                    block_n=cap, block_k=cap,
                )
                timed_chain(lambda c, call=call: call(c), x, nbytes,
                            f"{label}/int{bits}/cap{cap}")
            del qt
        del w, x


if __name__ == "__main__":
    main()
