#!/usr/bin/env python
"""Open-loop load test for the scheduled (continuous-batching) cascade.

Poisson arrivals at --rate req/s against a ScheduledCascadePipeline over
engine-backed tiers; reports per-request latency percentiles, throughput,
and stage distribution as ONE JSON line. The open-loop design (arrivals
don't wait for completions) measures what a production server faces:
queueing + lane contention + escalations, not just isolated decode speed.

CPU (tiny tiers):  python scripts/load_bench.py --n 24 --rate 4
TPU (7B widths):   python scripts/load_bench.py --tpu --n 32 --rate 8
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=24, help="total requests")
    ap.add_argument("--rate", type=float, default=4.0, help="arrivals/s")
    ap.add_argument("--max-tokens", type=int, default=16)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="authentic 7B-layer widths (needs the device)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    import jax

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from adaptive_sd_tpu.cascade import (
        EngineTextStage,
        PipelineConfig,
        ScheduledCascadePipeline,
        StageManager,
    )
    from adaptive_sd_tpu.core.types import RequestContext
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import TINY128, get_spec, init_params, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized
    from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")

    def tok(text):
        v = (get_spec("qwen2.5-7b").vocab_size if args.tpu else TINY128.vocab_size)
        return [(ord(c) % min(v - 1, 30000)) + 1 for c in text[:128]] or [1]

    def detok(ids):
        return " ".join(str(int(i)) for i in ids)

    stages = []
    if args.tpu:
        tiers = [("qwen2.5-7b", 2, 1.0), ("qwen2.5-32b", 2, 4.0)]
        for i, (base, layers, cost) in enumerate(tiers):
            spec = dataclasses.replace(
                scaled_spec(get_spec(base), layers=layers, name=f"load-{base}-l{layers}"),
                vocab_size=32768, tie_embeddings=False,
            )
            params = init_params_quantized(spec, jax.random.key(i), bits=8)
            eng = TierEngine(spec, params, page_size=128, n_pages=512,
                             use_pallas=on_dev, cost_per_token=cost)
            stages.append(EngineTextStage(eng, tok, detok, name=base,
                                          cost_per_token=cost))
    else:
        for i, (name, layers, cost) in enumerate(
            [("tiny-a", 2, 1.0), ("tiny-b", 4, 2.2)]
        ):
            spec = dataclasses.replace(scaled_spec(TINY128, layers=layers, name=name))
            params = init_params(spec, jax.random.key(i))
            eng = TierEngine(spec, params, n_pages=256, use_pallas=False,
                             cost_per_token=cost)
            stages.append(EngineTextStage(eng, tok, detok, name=name,
                                          cost_per_token=cost))

    X, y, _ = generate_synthetic(n_prompts=300, n_stages=len(stages))
    pred = MLPQualityPredictor(n_stages=len(stages))
    pred.fit(X, y, epochs=15, patience=4)

    pipe = ScheduledCascadePipeline(
        StageManager(stages), pred, PipelineConfig(lam=1.0, enable_caching=False),
        max_batch=args.lanes, scan_steps=args.scan_steps,
    )
    try:
        # warm: compile admission/decode/verify graphs before timing
        pipe.process_request(RequestContext(prompt="warm up the graphs",
                                            max_tokens=args.max_tokens))
        rng = np.random.default_rng(args.seed)
        gaps = rng.exponential(1.0 / args.rate, size=args.n)
        prompts = [
            "request %d: " % i + " ".join(
                rng.choice(["prove", "list", "explain", "compute", "draft"],
                           size=6).tolist()
            )
            for i in range(args.n)
        ]
        jobs = []
        t_start = time.perf_counter()
        for i in range(args.n):
            time.sleep(float(gaps[i]))
            t_sub = time.perf_counter()
            job = pipe.submit(
                RequestContext(prompt=prompts[i], max_tokens=args.max_tokens)
            )
            jobs.append((t_sub, job))
        lat = []
        for t_sub, job in jobs:
            assert job.wait(timeout=600), "request timed out"
            lat.append(job.result.total_latency_s)
        wall = time.perf_counter() - t_start
        lat = np.asarray(lat)
        stats = pipe.get_stats()
        out = {
            "metric": "scheduled_cascade_load",
            "platform": platform,
            "n": args.n,
            "offered_rate_rps": args.rate,
            "achieved_rps": round(args.n / wall, 2),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
            "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
            "stage_distribution": [round(x, 3) for x in stats["stage_distribution"]],
            "errors": stats["errors"],
            "scan_steps": args.scan_steps,
            "lanes": args.lanes,
        }
        print(json.dumps(out))
    finally:
        pipe.shutdown()


if __name__ == "__main__":
    main()
