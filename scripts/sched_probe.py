#!/usr/bin/env python
"""Diagnose the scheduled plane's under-load capacity on the real device.

LOADBENCH_r03 measured ~1.7 req/s / ~55 tokens/s at 8 lanes — far below the
kernel ceiling. This probe decomposes that number using the scheduler's
per-dispatch timing stats (engine/scheduler.py ``stats()["dispatch"]``):

  A. saturation: all requests submitted at once into tier 0 (the
     tpu_sched_bench shape) — the plane's ceiling, steady-state scans only;
  B. trickle: same requests Poisson-paced at --rate into tier 0 — arrival
     staggering fragments admissions into small batch buckets and interleaves
     admit/scan dispatches;
  C. concurrent tiers: trickle while two other tier schedulers (32B/72B
     widths) run their own traffic — tunnel/GIL contention across threads.

Each phase prints tokens/s plus the dispatch breakdown (count, mean, max per
kind and the distinct graph-bucket tally) so cold-graph stalls are visible.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--rate", type=float, default=16.0)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
    from adaptive_sd_tpu.models import TINY128, get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    t0_all = time.time()

    def progress(msg):
        print(f"[probe +{time.time() - t0_all:5.1f}s] {msg}",
              file=sys.stderr, flush=True)

    vocab = 32768 if on_dev else TINY128.vocab_size
    names = (["qwen2.5-7b", "qwen2.5-32b", "qwen2.5-72b"]
             if on_dev else ["tiny"] * 3)
    engines = []
    for i, base in enumerate(names):
        spec = dataclasses.replace(
            scaled_spec(get_spec(base) if on_dev else TINY128, layers=2,
                        name=f"probe-{base}-l{i}"),
            vocab_size=vocab, tie_embeddings=False,
        )
        engines.append(TierEngine(
            spec, init_params_quantized(spec, jax.random.key(i), bits=8),
            page_size=128 if on_dev else 16, n_pages=512 if on_dev else 256,
            use_pallas=on_dev, enable_prefix_cache=True,
        ))
        progress(f"tier {i} ({base}) built")

    rng = np.random.default_rng(0)
    # variable prompt lengths like the load bench's workload (tok() caps 192)
    def mk_prompts(n, seed):
        r = np.random.default_rng(seed)
        return [
            [int(x) for x in r.integers(1, 30000, int(r.integers(40, 192)))]
            for _ in range(n)
        ]

    def sched_for(eng):
        return ContinuousBatchingScheduler(
            eng, max_batch=args.lanes, max_context=512,
            scan_steps=args.scan_steps,
        )

    def drain(sched, reqs, t0):
        for r in reqs:
            assert r.wait(timeout=600), "probe request hung"
            assert r.error is None, r.error
        wall = time.perf_counter() - t0
        toks = sum(len(r.out_tokens) for r in reqs)
        st = sched.stats()
        return {
            "wall_s": round(wall, 3),
            "achieved_rps": round(len(reqs) / wall, 2),
            "tokens_per_s": round(toks / wall, 1),
            "dispatch": st["dispatch"],
            "graph_buckets": st["graph_buckets"],
            "bucket_hits": st["bucket_hits"],
            # any traffic bucket outside the warmed lattice compiled cold
            "cold_buckets": sorted(
                " ".join(map(str, k))
                for k in set(sched._buckets) - sched._warm_buckets
            ),
        }

    report = {"metric": "sched_probe", "platform": platform,
              "lanes": args.lanes, "scan_steps": args.scan_steps,
              "max_tokens": args.max_tokens, "n": args.n}

    # ---- phase A: saturation ceiling on tier 0 -----------------------------
    sched = sched_for(engines[0])
    w = sched.warmup(max_draft=args.max_tokens)
    report["warmup"] = w
    progress(f"warmup: {w['graphs']} graphs in {w['wall_s']}s")
    sched.start()
    prompts = mk_prompts(args.n, 1)
    t0 = time.perf_counter()
    reqs = [sched.submit(p, max_new=args.max_tokens) for p in prompts]
    report["saturation"] = drain(sched, reqs, t0)
    progress(f"A saturation: {report['saturation']['tokens_per_s']} tok/s")
    sched.stop()

    # ---- phase B: trickle into tier 0 ---------------------------------------
    sched = sched_for(engines[0])
    sched.warmup(max_draft=args.max_tokens)  # engine jit cache is shared: fast
    sched.start()
    gaps = np.random.default_rng(7).exponential(1.0 / args.rate, size=args.n)
    prompts = mk_prompts(args.n, 2)
    t0 = time.perf_counter()
    reqs = []
    for gap, p in zip(gaps, prompts):
        time.sleep(float(gap))
        reqs.append(sched.submit(p, max_new=args.max_tokens))
    report["trickle"] = drain(sched, reqs, t0)
    progress(f"B trickle: {report['trickle']['tokens_per_s']} tok/s "
             f"rps={report['trickle']['achieved_rps']}")
    sched.stop()

    # ---- phase C: trickle with two other tier schedulers running -----------
    scheds = [sched_for(e) for e in engines]
    for s in scheds:
        s.warmup(max_draft=args.max_tokens)
        s.start()
    # background traffic on tiers 1/2 (enough to keep their loops dispatching)
    bg = []
    for k in (1, 2):
        bg += [scheds[k].submit(p, max_new=args.max_tokens * 2)
               for p in mk_prompts(args.lanes, 50 + k)]
    prompts = mk_prompts(args.n, 3)
    t0 = time.perf_counter()
    reqs = []
    for gap, p in zip(gaps, prompts):
        time.sleep(float(gap))
        reqs.append(scheds[0].submit(p, max_new=args.max_tokens))
    report["concurrent"] = drain(scheds[0], reqs, t0)
    report["concurrent"]["bg_dispatch"] = [
        s.stats()["dispatch"] for s in scheds[1:]
    ]
    progress(f"C concurrent: {report['concurrent']['tokens_per_s']} tok/s "
             f"rps={report['concurrent']['achieved_rps']}")
    for r in bg:
        r.wait(timeout=600)
    for s in scheds:
        s.stop()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
