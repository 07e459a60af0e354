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

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", action="store_true",
                    help="also time a full 72B-width decode layer with "
                         "act_quant on/off (the W8A8 default-path check)")
    ap.add_argument("--stream", action="store_true",
                    help="also measure raw int8-vs-bf16 HBM streaming (the "
                         "element-rate-vs-byte-rate bound experiment)")
    args = ap.parse_args()

    from adaptive_sd_tpu.ops.matmul_q import (
        quantized_matmul,
        quantized_matmul_w8a8,
    )
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

    def timed_w8a8_chain(cap, x0, q, scale, n_bytes, label):
        @functools.partial(jax.jit, static_argnames=("cap",))
        def chain(x, q, scale, n, *, cap):
            def body(_, carry):
                y = quantized_matmul_w8a8(
                    carry, q, scale, block_n=cap, block_k=cap
                )
                return carry + y.mean().astype(carry.dtype) * 1e-30

            return jax.lax.fori_loop(0, n, body, x).sum()

        try:
            ts = {}
            for n in (ITERS_LO, ITERS_HI):
                args_ = (x0, q, scale, jnp.int32(n))
                jax.device_get(chain(*args_, cap=cap))
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.device_get(chain(*args_, cap=cap))
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
        # W8A8 dynamic: int8 activations on the native int8 MXU path — no
        # VPU dequant of the weight stream at all (the escape route from the
        # element-rate bound if the bound is dequant-issue, VERDICT r4 #6)
        qt8 = quantize_int8(w)
        nbytes8 = qt8.q.size * qt8.q.dtype.itemsize
        for cap in (512, 1024, 2048):
            timed_w8a8_chain(cap, x, qt8.q, qt8.scale, nbytes8,
                             f"{label}/w8a8/cap{cap}")
        del qt8
        # group-wise INT4 (fused dequant per K-group inside the kernel)
        qt4g = quantize_int4(w, group_size=128)
        for cap in (1024, 2048):
            timed_chain(4, cap, x, qt4g.q, qt4g.scale,
                        qt4g.q.size * qt4g.q.dtype.itemsize,
                        f"{label}/int4g128/cap{cap}")
        del qt4g, w, x

    if args.stream:
        # Raw streaming bound: a reduce over a large resident array. If int8
        # reduce tops out near the same ELEMENT rate as bf16 (and far below
        # bf16's byte rate), the ~430-470 G-elem/s int8 wall is the memory
        # pipeline's element-issue bound, not the kernels' inefficiency.
        n_elems = 1 << 29  # 512 Mi elements
        for dt, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16"),
                         (jnp.float32, "f32")):
            big = jnp.ones((n_elems,), dt)

            @jax.jit
            def red(x, n):
                def body(_, c):
                    return c + x.sum().astype(jnp.float32) * 1e-30
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            ts = {}
            for n in (4, 16):
                jax.device_get(red(big, jnp.int32(n)))
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    jax.device_get(red(big, jnp.int32(n)))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
            per = max(ts[16] - ts[4], 1e-9) / 12
            nbytes = n_elems * jnp.dtype(dt).itemsize
            print(json.dumps({
                "row": f"stream-reduce/{name}",
                "ms": round(per * 1e3, 3),
                "gbps": round(nbytes / per / 1e9, 1),
                "gelems": round(n_elems / per / 1e9, 1),
            }), flush=True)
            del big

    if args.layer:
        # Full decode layer at 72B width, act_quant on vs off: the honest
        # end-to-end check of whether W8A8 moves the per-layer decode step
        # (kernel GB/s alone can mislead — the layer also pays attention,
        # norms and collectives-free epilogues).
        import dataclasses

        from adaptive_sd_tpu.engine import TierEngine
        from adaptive_sd_tpu.models import get_spec, scaled_spec
        from adaptive_sd_tpu.models.qwen import init_params_quantized

        on_dev = jax.devices()[0].platform in ("tpu", "axon")
        for depth_pair in ((2, 6),):
            lo, hi = depth_pair
            per_layer = {}
            for aq in (False, True):
                step_t = {}
                for L in depth_pair:
                    spec = dataclasses.replace(
                        scaled_spec(get_spec("qwen2.5-72b"), layers=L,
                                    name=f"sweep-72b-l{L}"),
                        vocab_size=32768, tie_embeddings=False,
                    )
                    params = init_params_quantized(spec, jax.random.key(0),
                                                   bits=8)
                    eng = TierEngine(
                        spec, params, page_size=128, n_pages=8 * 3 + 8,
                        use_pallas=on_dev, act_quant=aq,
                    )
                    prompts = [[7] * 128] * 8
                    def gen(n):
                        return eng.generate(prompts, max_new=n)
                    gen(48); gen(1)
                    best48 = best1 = float("inf")
                    for _ in range(5):
                        t0 = time.perf_counter(); gen(48)
                        best48 = min(best48, time.perf_counter() - t0)
                        t0 = time.perf_counter(); gen(1)
                        best1 = min(best1, time.perf_counter() - t0)
                    step_t[L] = (best48 - best1) / 47
                    del eng, params
                per_layer[aq] = (step_t[hi] - step_t[lo]) / (hi - lo)
            print(json.dumps({
                "row": "decode-layer-72b/int8",
                "per_layer_ms_weight_only": round(per_layer[False] * 1e3, 4),
                "per_layer_ms_act_quant": round(per_layer[True] * 1e3, 4),
                "speedup": round(per_layer[False] / per_layer[True], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
