#!/usr/bin/env python
"""Open-loop load test for the scheduled (continuous-batching) cascade.

Poisson arrivals at --rate req/s against a ScheduledCascadePipeline over
engine-backed tiers; reports per-request latency percentiles, throughput,
stage distribution, and preemption counts — once with speculative prefix
prefetch OFF and once ON (VERDICT r2 #2/#10: the serving plane's latency
story, measured). The open-loop design (arrivals don't wait for completions)
measures what a production server faces: queueing + lane contention +
escalations, not just isolated decode speed.

The routing stack is the production one: a predictor trained on per-stage
engine drafts + prompt-only rows (prompt-conditional priors and direct entry
active at their PipelineConfig defaults), DP stopping over measured costs.

CPU (tiny tiers):  python scripts/load_bench.py --n 24 --rate 4
TPU (real widths): python scripts/load_bench.py --tpu --n 48 --rate 4 \
                       --out LOADBENCH_r03.json
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
    ap.add_argument("--n", type=int, default=24, help="total requests per pass")
    ap.add_argument("--rate", type=float, default=4.0, help="arrivals/s")
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="authentic 7B/32B/72B layer widths (needs the device)")
    ap.add_argument("--pressure", action="store_true",
                    help="scarce KV pages: forces preemption under load")
    ap.add_argument("--prefix-spill-mb", type=int, default=0,
                    help="host-spill budget (MiB) for evicted prefix-cache "
                         "pages (0 disables CPU KV offload)")
    ap.add_argument("--preemption-mode", default="recompute",
                    choices=("recompute", "swap"),
                    help="what page-pressure victims pay to come back: "
                         "re-prefill (recompute) or host KV offload with "
                         "bit-exact restore (swap)")
    ap.add_argument("--out", default=None,
                    help="write the full report JSON to this path")
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
    from adaptive_sd_tpu.evalx.workload import (
        make_workload,
        solve_prob_matrix,
        tier_capabilities,
    )
    from adaptive_sd_tpu.models import TINY128, get_spec, init_params, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized
    from adaptive_sd_tpu.predict import MLPQualityPredictor
    from adaptive_sd_tpu.predict.features import extract_features

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    t0_all = time.time()

    def progress(msg):
        print(f"[load +{time.time() - t0_all:5.1f}s] {msg}",
              file=sys.stderr, flush=True)

    vocab = 32768 if args.tpu else TINY128.vocab_size

    def tok(text):
        return [(ord(c) % min(vocab - 1, 30000)) + 1 for c in text[:192]] or [1]

    def detok(ids):
        return " ".join(str(int(i)) for i in ids)

    # Pressure geometry must actually BIND mid-decode: admission pre-grants
    # pages through the first boundary, so preemption requires lanes to grow
    # while the pool is short. Small pages make every request cross several
    # boundaries during decode; the pool is sized so ~8 concurrent lanes
    # cannot all grow (scheduler._ensure_pages then preempts the newest /
    # lowest-priority lane — recompute re-admission completes it later).
    if args.pressure:
        page_size = 32 if args.tpu else 16
        # ~lanes * pages_per_admission (prompt <= 192 toks / page) + slack
        n_pages = args.lanes * (192 // page_size) // 2 + 6
    else:
        page_size = 128 if args.tpu else 16
        n_pages = 512 if args.tpu else 256

    def build_stages():
        stages = []
        if args.tpu:
            # Per-tier depths chosen so the MEASURED step-time ratios
            # approximate the projected full-depth cascade economics within
            # one chip's memory (VERDICT r3 next #3: equal-depth tiers gave
            # ratios ~[1, 1, 1.3], so the router's under-load behavior said
            # nothing about the real system; per-layer times 0.43/0.81/1.36
            # ms give [1, ~3, ~6] at depths 2/5/8 — clearing the >= [1, 2.5,
            # 5] target). The 72B tier's page pool is trimmed to fit.
            tiers = [("qwen2.5-7b", 2, n_pages),
                     ("qwen2.5-32b", 5, n_pages),
                     ("qwen2.5-72b", 8, max(n_pages * 3 // 4, 64))]
            for i, (base, layers, np_i) in enumerate(tiers):
                spec = dataclasses.replace(
                    scaled_spec(get_spec(base), layers=layers,
                                name=f"load-{base}-l{layers}"),
                    vocab_size=vocab, tie_embeddings=False,
                )
                params = init_params_quantized(spec, jax.random.key(i), bits=8)
                eng = TierEngine(spec, params, page_size=page_size,
                                 n_pages=np_i,
                                 use_pallas=on_dev, enable_prefix_cache=True,
                                 prefix_spill_bytes=args.prefix_spill_mb << 20)
                stages.append(EngineTextStage(eng, tok, detok, name=base,
                                              stage_index=i))
        else:
            for i, (name, layers) in enumerate(
                [("tiny-a", 2), ("tiny-b", 4), ("tiny-c", 8)]
            ):
                spec = dataclasses.replace(
                    scaled_spec(TINY128, layers=layers, name=name))
                params = init_params(spec, jax.random.key(i))
                eng = TierEngine(spec, params, page_size=page_size,
                                 n_pages=n_pages,
                                 use_pallas=False, enable_prefix_cache=True,
                                 prefix_spill_bytes=args.prefix_spill_mb << 20)
                stages.append(EngineTextStage(eng, tok, detok, name=name,
                                              stage_index=i))
        return stages

    stages = build_stages()
    n_tiers = len(stages)

    # measured per-tier cost (one warm fused generate each)
    costs = []
    warm_toks = [tok("calibration prompt %d" % i) for i in range(4)]
    for st in stages:
        st.engine.generate(warm_toks, max_new=8)  # compile
        t0 = time.perf_counter()
        st.engine.generate(warm_toks, max_new=8)
        costs.append(time.perf_counter() - t0)
    costs = [c / costs[0] for c in costs]
    progress(f"tiers built; measured cost ratios {[round(c, 2) for c in costs]}")

    # --- predictor: engine drafts + per-stage prompt-only rows --------------
    n_train = 96 if args.tpu else 64
    train_items = make_workload(n_train, seed=5)
    caps = tier_capabilities(n_tiers)
    p_true = solve_prob_matrix(train_items, caps, 0.05)
    rng = np.random.default_rng(args.seed)
    X, y, texts = [], [], []
    # pressure pools are sized to bind under the PASS's concurrency; the
    # training-draft phase must fit its batch in pages, so chunk it small
    Bc = 2 if args.pressure else args.lanes
    drafts_by_stage = [[] for _ in range(n_tiers)]
    for i in range(0, n_train, Bc):
        chunk = train_items[i : i + Bc]
        toks = [tok(it.prompt) for it in chunk]
        for k, st in enumerate(stages):
            outs = st.engine.generate(toks, max_new=16)
            drafts_by_stage[k] += outs
    for i, it in enumerate(train_items):
        for k in range(n_tiers):
            o = drafts_by_stage[k][i]
            draft = detok(o.token_ids.tolist())
            X.append(extract_features(it.prompt, draft, o.logprobs, k,
                                      n_stages=n_tiers, cost=costs[k]))
            y.append(float(rng.random() < p_true[i, k]))
            texts.append((it.prompt, draft))
            X.append(extract_features(it.prompt, "", None, k, n_stages=n_tiers))
            y.append(float(rng.random() < p_true[i, k]))
            texts.append((it.prompt, ""))
    pred = MLPQualityPredictor(n_stages=n_tiers)
    rep = pred.fit(np.stack(X), np.asarray(y, np.float32), epochs=30,
                   patience=6, calibrate=True)
    progress(f"predictor trained (val_auc={rep.val_auc:.3f})")

    gaps = np.random.default_rng(args.seed).exponential(
        1.0 / args.rate, size=args.n)

    def run_pass(enable_prefetch: bool) -> dict:
        # distinct prompts per pass (same distribution): the shared engines'
        # prefix caches must not leak pass-1 prompt pages into pass 2
        eval_items = make_workload(
            max(args.n, 8), seed=args.seed + 17 + int(enable_prefetch))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), pred,
            PipelineConfig(lam=1.0, enable_caching=False,
                           enable_prefetch=enable_prefetch),
            costs=costs,
            max_batch=args.lanes, max_context=512, scan_steps=args.scan_steps,
            preemption_mode=args.preemption_mode,
        )
        try:
            # Precompile the whole serving graph lattice (admission windows,
            # escalation verifies, decode scans — scheduler.warmup) so no
            # cold compile/load through the remote-compile tunnel is billed
            # to the measured pass; a short real burst then warms the
            # host-side paths (tokenizer, predictor, prefix-cache inserts).
            wrep = pipe.warmup(max_draft=args.max_tokens)
            progress(f"lattice warm: " + ", ".join(
                f"{k}:{v['graphs']}g/{v['wall_s']}s" for k, v in wrep.items()))
            warm_items = make_workload(4, seed=args.seed + 23)
            warm_jobs = [
                pipe.submit(RequestContext(
                    prompt=it.prompt, max_tokens=args.max_tokens,
                    request_id=f"warm{j}"))
                for j, it in enumerate(warm_items)
            ]
            for j in warm_jobs:
                j.wait(timeout=900)
            pipe.reset_stats()
            jobs = []
            t_start = time.perf_counter()
            for i in range(args.n):
                time.sleep(float(gaps[i]))
                jobs.append(pipe.submit(RequestContext(
                    prompt=eval_items[i].prompt, max_tokens=args.max_tokens,
                    request_id=f"lb{i}")))
            lat, toks_out = [], 0
            for job in jobs:
                assert job.wait(timeout=900), "request timed out"
                lat.append(job.result.total_latency_s)
                toks_out += sum(
                    sr.output.num_generated_tokens or 0
                    for sr in job.result.stage_results
                )
            wall = time.perf_counter() - t_start
            lat = np.asarray(lat)
            stats = pipe.get_stats()
            scheds = stats.get("schedulers", [])
            # per-tier dispatch accounting: where the scheduler threads'
            # wall time went, and whether any graph bucket compiled cold
            # during the measured pass (warmup should leave zero)
            dispatch = [s.get("dispatch", {}) for s in scheds]
            cold = sorted(
                f"t{k} " + " ".join(map(str, key))
                for k, sc in enumerate(pipe.schedulers)
                for key in set(sc._buckets) - sc._warm_buckets
            )
            return {
                "prefetch": enable_prefetch,
                "offered_rate_rps": args.rate,
                "achieved_rps": round(args.n / wall, 2),
                "serving_tokens_per_s": round(toks_out / wall, 1),
                "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
                "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
                "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
                "latency_mean_s": round(float(lat.mean()), 3),
                "stage_distribution": [round(x, 3)
                                       for x in stats["stage_distribution"]],
                "preemptions": int(sum(s.get("preemptions", 0) for s in scheds)),
                "swap_preemptions": int(
                    sum(s.get("swap_preemptions", 0) for s in scheds)),
                "prefetches": int(stats.get("prefetches", 0)),
                "prefetch_suppressed": int(stats.get("prefetch_suppressed", 0)),
                "errors": stats["errors"],
                "dispatch_per_tier": dispatch,
                "cold_graph_buckets": cold,
            }
        finally:
            pipe.shutdown()

    rows = []
    for enable in (False, True):
        rows.append(run_pass(enable))
        progress(f"pass prefetch={enable}: p50={rows[-1]['latency_p50_s']}s "
                 f"p95={rows[-1]['latency_p95_s']}s "
                 f"rps={rows[-1]['achieved_rps']}")

    out = {
        "metric": "scheduled_cascade_load",
        "platform": platform,
        "n": args.n,
        "tiers": [st.name for st in stages],
        "lanes": args.lanes,
        "scan_steps": args.scan_steps,
        "max_tokens": args.max_tokens,
        "page_pressure": bool(args.pressure),
        "preemption_mode": args.preemption_mode,
        "predictor_val_auc": round(float(rep.val_auc), 4),
        "measured_cost_ratios": [round(c, 2) for c in costs],
        "passes": rows,
        "wall_s": round(time.time() - t0_all, 1),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        progress(f"wrote {args.out}")


if __name__ == "__main__":
    main()
