#!/usr/bin/env python
"""Tunnel round-trip decomposition: what is irreducible per blocking sync?

dispatch_probe.py showed a ~24 ms p50 for ANY blocking host<->device
operation (even a 288-byte device_put). This probe separates:

  rtt_sync       block_until_ready on a trivial resident-arg jitted add —
                 the pure dispatch+sync round trip
  rtt_fetch      device_get of a tiny READY array (result computed long ago)
  dispatch_async jitted call WITHOUT blocking (host-side enqueue cost)
  overlap        N chained scans dispatched back-to-back then one fetch:
                 per-round cost when the host stops blocking every round
                 (the pipelined-scheduler bound)

Writes DISPATCH_PROBE2.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def stats(xs):
    xs = sorted(xs)
    return {"p50_ms": round(1e3 * xs[len(xs) // 2], 3),
            "min_ms": round(1e3 * xs[0], 3),
            "p90_ms": round(1e3 * xs[int(len(xs) * 0.9)], 3)}


def timed(fn, reps=30, warm=3):
    for _ in range(warm):
        fn()
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return stats(xs)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="DISPATCH_PROBE2.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    report = {"metric": "tunnel_rtt_decomposition", "platform": platform}
    t_all = time.time()

    a = jax.device_put(jnp.ones((8,), jnp.float32))
    b = jax.device_put(jnp.ones((8,), jnp.float32))
    add = jax.jit(lambda x, y: x + y)
    add(a, b).block_until_ready()

    report["rtt_sync_tiny_add"] = timed(lambda: add(a, b).block_until_ready())

    ready = add(a, b)
    ready.block_until_ready()
    report["rtt_fetch_ready_array"] = timed(lambda: np.asarray(
        jax.device_get(ready)))

    def async_only():
        add(a, b)  # no block

    report["dispatch_async_enqueue"] = timed(async_only, reps=100)
    jax.block_until_ready(add(a, b))

    # chained scans: device-resident carry, fetch every K rounds ------------
    base = "qwen2.5-7b" if on_dev else "tiny128"
    vocab = 32768 if on_dev else 2048
    spec = dataclasses.replace(
        scaled_spec(get_spec(base), layers=2, name="probe2-t0"),
        vocab_size=vocab, tie_embeddings=False,
    )
    params = init_params_quantized(spec, jax.random.key(0), bits=8)
    eng = TierEngine(spec, params, page_size=128, n_pages=96,
                     use_pallas=on_dev)
    B, scan_steps = 8, 8
    tables = jnp.asarray(
        np.arange(B * 8, dtype=np.int32).reshape(B, 8))
    tok = jnp.full((B,), 7, jnp.int32)
    pos = jnp.full((B,), 16, jnp.int32)
    temps = jnp.zeros((B,), jnp.float32)
    tps = jnp.ones((B,), jnp.float32)
    rem = jnp.full((B,), 10_000, jnp.int32)

    scan = eng._decode_scan_jit

    def chain_rounds(k: int, reset_pos=True):
        """k chained scans (device carry), one packed fetch at the end."""
        nonlocal pos
        if reset_pos:
            pos = jnp.full((B,), 16, jnp.int32)
        t = tok
        p = pos
        outs = []
        for i in range(k):
            out_t, out_l, emitted, qb, _fin, eng.cache = scan(
                eng.params, t, p, eng.cache, tables, temps, tps,
                jax.random.key(i), rem, n_steps=scan_steps,
                eos_id=None, return_topk=0,
            )
            # carry: last emitted token + advanced positions, ON DEVICE
            t = out_t[:, -1]
            p = p + emitted
            outs.append((out_t, out_l, emitted))
        from adaptive_sd_tpu.engine.decode import _fetch_host
        _fetch_host(outs)

    for k in (1, 2, 4, 8):
        r = timed(lambda k=k: chain_rounds(k), reps=10, warm=2)
        r["per_round_ms"] = round(r["p50_ms"] / k, 3)
        report[f"chained_{k}_rounds_one_fetch"] = r

    report["wall_s"] = round(time.time() - t_all, 1)
    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
