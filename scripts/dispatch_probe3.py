#!/usr/bin/env python
"""Blocking-fetch poll-tick experiment.

DISPATCH_PROBE.json shows a pure-carry scheduler round (no fresh
transfers, no patches) still costs ~34.6 ms while the chained marginal
round is ~12 ms (DISPATCH_PROBE2.json) and a READY result fetches in
0.02 ms. Hypothesis: blocking on an IN-FLIGHT result pays a coarse
(~20-25 ms) wait tick inside the tunnel client. If true, spinning on
``jax.Array.is_ready()`` with sub-ms host sleeps should bring the round
to ~compute time.

Measures one carried scan round fetched three ways:
  block     _fetch_host immediately (the current scheduler behaviour)
  spin      poll is_ready() every 0.5 ms, then _fetch_host
  sleep     sleep an EMA of compute time, then _fetch_host

Writes DISPATCH_PROBE3.json.
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


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="DISPATCH_PROBE3.json")
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
    from adaptive_sd_tpu.engine.decode import _fetch_host
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    base = "qwen2.5-7b" if on_dev else "tiny128"
    vocab = 32768 if on_dev else 2048
    spec = dataclasses.replace(
        scaled_spec(get_spec(base), layers=2, name="probe3-t0"),
        vocab_size=vocab, tie_embeddings=False,
    )
    params = init_params_quantized(spec, jax.random.key(0), bits=8)
    eng = TierEngine(spec, params, page_size=128, n_pages=96,
                     use_pallas=on_dev)
    B, scan_steps = 8, 8
    tables = jnp.asarray(np.arange(B * 8, dtype=np.int32).reshape(B, 8))
    carry = eng.scan_carry_init(
        np.full((B,), 7, np.int32), np.full((B,), 16, np.int32),
        np.full((B,), 100000, np.int32), np.zeros((B,), np.float32),
        np.ones((B,), np.float32), seed=0,
    )
    scan = eng._decode_scan_jit

    def dispatch(c):
        out_t, out_l, emitted, qb, fin, eng.cache = scan(
            eng.params, c["tok"], c["pos"], eng.cache, tables, c["temps"],
            c["top_ps"], c["key"], c["rem"],
            n_steps=scan_steps, eos_id=None, return_topk=0,
        )
        nc = dict(c)
        nc["tok"], nc["pos"], nc["rem"], nc["key"] = fin
        return (out_t, out_l, emitted), nc

    # warm
    outs, carry = dispatch(carry)
    _fetch_host(outs)

    report = {"metric": "fetch_poll_tick", "platform": platform}
    results = {}

    def run(mode, reps=30):
        nonlocal carry
        xs, spins = [], []
        ema = 0.012
        for _ in range(reps):
            t0 = time.perf_counter()
            outs, carry = dispatch(carry)
            if mode == "spin":
                n = 0
                probe = outs[0]
                while not probe.is_ready():
                    time.sleep(0.0005)
                    n += 1
                spins.append(n)
            elif mode == "sleep":
                time.sleep(max(ema - 0.001, 0.0))
            _fetch_host(outs)
            dt = time.perf_counter() - t0
            ema = 0.9 * ema + 0.1 * dt
            xs.append(dt)
        r = stats(xs)
        if spins:
            r["spin_iters_p50"] = sorted(spins)[len(spins) // 2]
        return r

    for mode in ("block", "spin", "sleep", "block"):
        key = mode if mode not in results else mode + "2"
        results[key] = run(mode)
    report.update(results)
    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
