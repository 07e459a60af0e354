#!/usr/bin/env python
"""Decompose one scheduler dispatch round's host-side cost on the real chip.

CLAUDE.md records a ~30-32 ms full dispatch round (admit/scan/verify + host
bookkeeping + predictor + callbacks), depth-independent — ~2.5x the 7B
tier's projected full-depth batch step. This probe isolates where those
milliseconds go for the steady-state ``scan`` dispatch (the dominant kind):

  h2d       per-argument host->device transfer cost (the 6 numpy args of
            decode_sample_scan each pay a tunnel round trip) vs ONE packed
            transfer of the same bytes
  dispatch  jitted-call launch with all-device-resident args (pure dispatch)
  fetch     the packed result fetch (_fetch_host) alone
  e2e       engine.decode_sample_scan end to end (what scheduler._timed sees)
  sched     ContinuousBatchingScheduler.step(scan_steps) wall with full
            bookkeeping (lane scan, page growth, table assembly, advance)

Writes DISPATCH_PROBE.json. Run with the chip otherwise idle.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timed(fn, reps=30, warm=3):
    for _ in range(warm):
        fn()
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    xs.sort()
    return {
        "p50_ms": round(1e3 * xs[len(xs) // 2], 3),
        "min_ms": round(1e3 * xs[0], 3),
        "p90_ms": round(1e3 * xs[int(len(xs) * 0.9)], 3),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--out", default="DISPATCH_PROBE.json")
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
    from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    base = "qwen2.5-7b" if on_dev else "tiny128"
    vocab = 32768 if on_dev else 2048
    spec = dataclasses.replace(
        scaled_spec(get_spec(base), layers=2, name="probe-t0"),
        vocab_size=vocab, tie_embeddings=False,
    )
    params = init_params_quantized(spec, jax.random.key(0), bits=8)
    eng = TierEngine(spec, params, page_size=128, n_pages=64,
                     use_pallas=on_dev)
    B = args.lanes
    max_pages = 4
    t0 = time.time()

    # resident state mirroring a steady scan
    tokens = np.full((B,), 7, np.int32)
    positions = np.full((B,), 64, np.int32)
    tables = np.arange(B * max_pages, dtype=np.int32).reshape(B, max_pages)
    temps = np.zeros((B,), np.float32)
    tps = np.ones((B,), np.float32)
    remaining = np.full((B,), 64, np.int32)
    key = jax.random.key(1)

    # warm the scan graph through the engine path
    eng.decode_sample_scan(tokens, positions, tables, temps, key, remaining,
                           n_steps=args.scan_steps)

    report = {"metric": "dispatch_round_decomposition", "platform": platform,
              "lanes": B, "scan_steps": args.scan_steps,
              "base": base, "depth": 2}

    # --- h2d: per-arg transfers vs one packed transfer ----------------------
    def put_separate():
        outs = [jax.device_put(x) for x in
                (tokens, positions, tables, temps, tps, remaining)]
        jax.block_until_ready(outs)

    nbytes = sum(x.nbytes for x in
                 (tokens, positions, tables, temps, tps, remaining))
    packed = np.concatenate([
        x.view(np.int32).reshape(-1) if x.dtype != np.int32 else x.reshape(-1)
        for x in (tokens, positions, tables, temps, tps, remaining)
    ])

    def put_packed():
        jax.block_until_ready(jax.device_put(packed))

    report["h2d_separate_6args"] = timed(put_separate)
    report["h2d_packed_1arg"] = timed(put_packed)
    report["h2d_bytes"] = int(nbytes)

    # --- dispatch with device-resident args ---------------------------------
    dev_args = [jax.device_put(x) for x in
                (tokens, positions, tables, temps, tps, remaining)]
    jax.block_until_ready(dev_args)
    dt, dp, dtab, dte, dtp, drem = dev_args

    def dispatch_resident():
        out = eng._decode_scan_jit(
            eng.params, dt, dp, eng.cache, dtab, dte, dtp, key, drem,
            n_steps=args.scan_steps, eos_id=eng.eos_id, return_topk=0,
        )
        # cache is donated back; keep it current
        eng.cache = out[-1]
        jax.block_until_ready(out[0])

    if hasattr(eng, "_decode_scan_jit"):
        report["dispatch_resident_blocked"] = timed(dispatch_resident)

    # --- e2e engine call (what scheduler._timed measures) -------------------
    def e2e():
        eng.decode_sample_scan(tokens, positions, tables, temps, key,
                               remaining, n_steps=args.scan_steps)

    report["e2e_engine_call"] = timed(e2e)

    def e2e_step1():
        eng.decode_sample_batch(tokens, positions, tables, temps, key)

    eng.decode_sample_batch(tokens, positions, tables, temps, key)
    report["e2e_single_step"] = timed(e2e_step1)

    # --- full scheduler round ----------------------------------------------
    # Steady state: long budgets, enough context/pages that no lane retires
    # or patches during the measured rounds (23 rounds x scan_steps tokens).
    eng2 = TierEngine(spec, params, page_size=128, n_pages=B * 10 + 8,
                      use_pallas=on_dev)
    sched = ContinuousBatchingScheduler(
        eng2, max_batch=B, max_context=1024, scan_steps=args.scan_steps)
    for i in range(B):
        sched.submit([5] * 16, max_new=900, request_id=f"p{i}")
    sched.step(1)  # admit (prefill) once

    def sched_round():
        sched.step(args.scan_steps)

    report["sched_step_full_round"] = timed(sched_round, reps=20)
    report["sched_carry"] = sched.stats().get("carry")

    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
