#!/usr/bin/env python
"""Headline benchmark: adaptive-cascade speedup vs fixed-largest-tier decoding.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

What it measures (single chip — the driver's environment has one TPU):
* Real decode throughput (tokens/s) of three cascade tiers with *authentic
  per-layer shapes* of Qwen2.5-7B/32B/72B (depth/vocab reduced to fit one
  chip; weights random, INT8-quantized — timing is shape-dependent only).
* The optimal-stopping policy's stage distribution at lambda=1.0 over a
  difficulty-modelled workload (Beta(2,2) difficulties; per-tier acceptance
  from the calibrated capacity curve — same generator the tests use).
* Effective cascade tokens/s = 1 / E[sum of per-tier step times up to the
  stopping stage], compared against always running the largest tier.

vs_baseline = measured speedup / 6.33 (the reference's headline speedup on
8xH100, BASELINE.md). >1.0 means beating the reference's ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    t_start = time.time()
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, init_params, scaled_spec
    from adaptive_sd_tpu.models.qwen import quantize_model
    from adaptive_sd_tpu.policy import optimal_stopping_rule

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    import dataclasses

    if on_tpu:
        # Authentic per-layer widths; depth 2 + vocab 32768 to bound memory
        # and tunnel compile time. Per-token decode cost scales with width.
        layers, vocab, B, max_new, prompt_len = 2, 32768, 8, 32, 128
        tier_bases = ["qwen2.5-7b", "qwen2.5-32b", "qwen2.5-72b"]
        use_pallas = True
    else:  # CI/CPU fallback: tiny tiers, same code path
        layers, vocab, B, max_new, prompt_len = 2, 2048, 4, 8, 32
        tier_bases = ["tiny128", "tiny128", "tiny128"]
        use_pallas = False

    specs = []
    for i, base in enumerate(tier_bases):
        s = scaled_spec(get_spec(base), layers=layers, name=f"bench-t{i}")
        specs.append(dataclasses.replace(s, vocab_size=vocab, tie_embeddings=False))

    # --- build engines and measure real decode throughput per tier ---------
    tier_tps = []   # tokens/s per tier (batch-aggregate)
    tier_step = []  # seconds per decode step (whole batch)
    prompts = [[int(x) for x in np.random.default_rng(i).integers(1, vocab, prompt_len)]
               for i in range(B)]
    for i, spec in enumerate(specs):
        params = quantize_model(init_params(spec, jax.random.key(i)), bits=8)
        eng = TierEngine(
            spec, params, page_size=128,
            n_pages=B * ((prompt_len + max_new) // 128 + 2) + 8,
            use_pallas=use_pallas,
        )
        eng.generate(prompts, max_new=max_new)           # compile + warm
        t0 = time.perf_counter()
        outs = eng.generate(prompts, max_new=max_new)
        dt = time.perf_counter() - t0
        n_toks = sum(o.num_tokens for o in outs)
        tier_tps.append(n_toks / dt)
        tier_step.append(dt / max_new)  # batch step time
        del eng, params

    # --- stopping-policy stage distribution at lambda=1.0 -------------------
    lam = 1.0
    # Per-token cost ratios from *measured* step times (reference calibrates
    # costs the same way, src/serving/real_model_pipeline.py:313-362).
    costs_inc = [t / tier_step[0] for t in tier_step]
    costs_cum = list(np.cumsum(costs_inc))
    capacities = np.array([0.55, 0.80, 0.97])
    rng = np.random.default_rng(0)
    n_sim = 4000
    stage_counts = np.zeros(len(specs), np.int64)
    for _ in range(n_sim):
        d = rng.beta(2, 2)
        p = 1.0 / (1.0 + np.exp(-4.0 * (capacities - d)))
        p[-1] = max(p[-1], 0.99)
        k, _ = optimal_stopping_rule(p, costs_cum, lam)
        # escalation is stochastic: may stop earlier on acceptance
        stop = len(specs) - 1
        for i in range(k + 1):
            if i == k or rng.random() < p[i]:
                stop = i
                break
        stage_counts[stop] += 1
    dist = stage_counts / n_sim

    # --- effective cascade throughput ---------------------------------------
    # A request stopping at stage k costs sum_{j<=k} step_j per token.
    per_req_time = np.array([sum(tier_step[: k + 1]) for k in range(len(specs))])
    cascade_time = float(np.dot(dist, per_req_time))
    largest_time = tier_step[-1]
    speedup = largest_time / cascade_time
    cascade_tps = B * max_new / cascade_time / max_new  # requests*tok/s

    result = {
        "metric": "cascade_speedup_vs_fixed_largest",
        "value": round(float(speedup), 3),
        "unit": "x",
        "vs_baseline": round(float(speedup) / 6.33, 3),
        "platform": platform,
        "tier_tokens_per_s": [round(t, 1) for t in tier_tps],
        "tier_step_ms": [round(t * 1e3, 2) for t in tier_step],
        "measured_cost_ratios": [round(c, 2) for c in costs_inc],
        "stage_distribution": [round(float(d), 3) for d in dist],
        "cascade_tokens_per_s": round(B * max_new / cascade_time, 1),
        "lambda": lam,
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
