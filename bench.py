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
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized
    from adaptive_sd_tpu.policy import optimal_stopping_rule

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    import dataclasses

    if on_tpu:
        # Authentic per-layer widths; each tier measured at depth 2 and 6 so
        # the per-layer decode time can be projected to the model's TRUE
        # depth (28/64/80 layers won't fit one chip together). vocab 32768
        # bounds embed memory; weights random INT8 (timing is shape-bound).
        # max_new 48 stretches the decode segment so the prefill/step
        # subtraction and the depth differencing divide tunnel jitter
        # (~0.7 ms/dispatch) by a larger signal; 8 reps (best-of) because
        # dispatch noise is strictly additive.
        depths, vocab, B, max_new, prompt_len = (2, 6), 32768, 8, 48, 128
        tier_bases = ["qwen2.5-7b", "qwen2.5-32b", "qwen2.5-72b"]
        true_layers = [28, 64, 80]
        use_pallas = True
        reps = 8
    else:  # CI/CPU fallback: tiny tiers, same code path
        depths, vocab, B, max_new, prompt_len = (2, 4), 2048, 4, 8, 32
        tier_bases = ["tiny128", "tiny128", "tiny128"]
        true_layers = [2, 8, 16]
        use_pallas = False
        reps = 3

    # --- measure per-layer decode + verify time per tier (depth 2 vs 4) ----
    # Decode: fused generate. Verify: the speculative-escalation pass
    # (engine.verify_continue with a fully-accepted self-draft measures the
    # pure parallel verify, no residual decode).
    prompts = [[int(x) for x in np.random.default_rng(i).integers(1, vocab, prompt_len)]
               for i in range(B)]
    tier_tps = []       # measured tokens/s at depth-4 (batch-aggregate)
    tier_step = []      # PROJECTED full-depth batch decode step seconds
    tier_prefill = []   # PROJECTED full-depth prompt prefill seconds
    tier_verify = []    # PROJECTED full-depth verify-pass (prefill+accept) s
    per_layer_ms = []
    for i, base in enumerate(tier_bases):
        dec_times, ver_times, pre_times = {}, {}, {}
        for L in depths:
            spec = dataclasses.replace(
                scaled_spec(get_spec(base), layers=L, name=f"bench-t{i}-l{L}"),
                vocab_size=vocab, tie_embeddings=False,
            )
            params = init_params_quantized(spec, jax.random.key(i), bits=8)
            eng = TierEngine(
                spec, params, page_size=128,
                n_pages=B * ((prompt_len + max_new) // 128 + 2) + 8,
                use_pallas=use_pallas,
            )
            def timed(fn, reps=reps):
                fn()  # compile + warm
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    result = fn()
                    best = min(best, time.perf_counter() - t0)
                return best, result

            gen_wall, outs = timed(lambda: eng.generate(prompts, max_new=max_new))
            # budget=1 reuses the SAME bucketed graph (traced budget), so this
            # costs no extra compile and isolates prefill+overhead cleanly
            gen_one, _ = timed(lambda: eng.generate(prompts, max_new=1))
            step = max((gen_wall - gen_one) / (max_new - 1), 1e-6)
            dec_times[L] = step
            pre_times[L] = max(gen_one - step, 0.0)
            drafts = [o.token_ids.tolist() or [1] for o in outs]
            ver_wall, vouts = timed(
                lambda: eng.verify_continue(prompts, drafts, max_new=max_new)
            )
            # The timed call includes residual decode for rejected suffixes
            # (random weights -> fragile argmax -> partial acceptance).
            # Subtract those measured steps to isolate the verify pass.
            residual_steps = max_new - min(n_acc for _, n_acc in vouts)
            ver_times[L] = max(ver_wall - residual_steps * step, step)
            if L == depths[-1]:
                tier_tps.append(sum(o.num_tokens for o in outs) / gen_wall)
            del eng, params

        d_lo, d_hi = depths

        def project(times: dict) -> tuple[float, float]:
            layer_t = max((times[d_hi] - times[d_lo]) / (d_hi - d_lo), 0.0)
            overhead = max(times[d_lo] - d_lo * layer_t, 0.0)
            return layer_t, overhead + true_layers[i] * layer_t

        layer_t, full_t = project(dec_times)
        per_layer_ms.append(layer_t * 1e3)
        tier_step.append(max(full_t, 1e-6))
        tier_prefill.append(project(pre_times)[1])
        tier_verify.append(project(ver_times)[1])

    # --- lambda sweep: best speedup subject to >= 95% quality preservation --
    # (BASELINE.md north star: ">= 6x tokens/s over fixed-largest at >= 95%
    # answer quality".) Costs for the DP come from *measured* step times —
    # the reference calibrates the same way
    # (src/serving/real_model_pipeline.py:313-362).
    costs_inc = [t / tier_step[0] for t in tier_step]
    costs_cum_raw = np.cumsum(costs_inc)
    costs_cum = list(costs_cum_raw / costs_cum_raw[-1])
    n_tiers = len(tier_bases)
    # Capacities calibrated so the small tier suffices for ~2/3 of the
    # workload — the mix the reference's published lambda=1.0 stage
    # distribution implies (7B 66.2%, BASELINE.md).
    capacities = np.array([0.72, 0.86, 0.98])[:n_tiers]
    rng = np.random.default_rng(0)
    n_sim = 8000
    difficulties = rng.beta(2, 2, size=n_sim)
    good_draws = rng.random((n_sim, n_tiers))      # ground-truth goodness draws
    pred_noise = rng.normal(0.0, 0.05, (n_sim, n_tiers))  # predictor error
    # Fair baseline: fixed-largest also pays its own prompt prefill.
    largest_time = tier_prefill[-1] + tier_step[-1] * max_new

    # Decisiveness slope 16: a tier either clearly handles a prompt or
    # clearly doesn't (knowledge tasks are bimodal per model). This choice
    # reproduces the reference's published lambda=1.0 stage distribution
    # (7B ~66% / mid ~25% / top ~8%, BASELINE.md) under the DP policy.
    SLOPE = 16.0

    def p_good(stage: int, d: float) -> float:
        return float(1.0 / (1.0 + np.exp(-SLOPE * (capacities[stage] - d))))

    # realized goodness of each tier's answer for each request
    goodness = np.array(
        [[good_draws[s, i] < p_good(i, d) for i in range(n_tiers)]
         for s, d in enumerate(difficulties)]
    )
    q_largest = float(goodness[:, -1].mean())

    def escalation_times(d: float) -> np.ndarray:
        """Batch time to finish at tier k under ADAPTIVE speculative
        escalation: each higher tier either verifies the previous draft (one
        measured parallel pass + residual decode of the rejected fraction) or
        plain re-runs (prompt prefill + full decode) — whichever is cheaper
        given the draft's expected acceptance, mirroring the pipeline's
        min_draft_quality_for_verify policy."""
        t = np.empty(n_tiers)
        t[0] = tier_prefill[0] + max_new * tier_step[0]
        for j in range(1, n_tiers):
            acc = p_good(j - 1, d)
            spec_path = tier_verify[j] + (1.0 - acc) * max_new * tier_step[j]
            plain_path = tier_prefill[j] + max_new * tier_step[j]
            t[j] = t[j - 1] + min(spec_path, plain_path)
        return t

    def simulate(lam: float):
        """The DP routes on noisy predictor estimates; realized quality is
        the ground-truth goodness at the stopping tier."""
        counts = np.zeros(n_tiers, np.int64)
        q_sum = 0.0
        t_sum = 0.0
        for s_idx, d in enumerate(difficulties):
            p_hat = np.clip(
                [p_good(i, d) + pred_noise[s_idx, i] for i in range(n_tiers)], 0.0, 1.0
            )
            p_hat[-1] = max(p_hat[-1], 0.99)
            esc_t = escalation_times(d)
            stop, _ = optimal_stopping_rule(p_hat, esc_t / largest_time, lam)
            counts[stop] += 1
            q_sum += float(goodness[s_idx, stop])
            t_sum += esc_t[stop]
        dist = counts / n_sim
        return dist, q_sum / n_sim, largest_time / (t_sum / n_sim)

    best = None
    sweep = []
    for lam in np.geomspace(0.01, 10.0, 25):
        dist, q_avg, spd = simulate(float(lam))
        preservation = q_avg / q_largest
        sweep.append((float(lam), preservation, spd))
        if preservation >= 0.95 and (best is None or spd > best[2]):
            best = (float(lam), preservation, spd, dist)
    if best is None:  # fall back to the most quality-preserving point
        lam, preservation, spd = max(sweep, key=lambda t: t[1])
        dist, q_avg, spd = simulate(lam)
        best = (lam, q_avg / q_largest, spd, dist)
    lam, preservation, speedup, dist = best
    cascade_time = largest_time / speedup

    result = {
        "metric": "cascade_speedup_vs_fixed_largest",
        "value": round(float(speedup), 3),
        "unit": "x",
        "vs_baseline": round(float(speedup) / 6.33, 3),
        "platform": platform,
        "tier_tokens_per_s_depth4": [round(t, 1) for t in tier_tps],
        "per_layer_step_ms": [round(t, 3) for t in per_layer_ms],
        "projected_full_depth_step_ms": [round(t * 1e3, 2) for t in tier_step],
        "projected_prefill_ms": [round(t * 1e3, 2) for t in tier_prefill],
        "projected_verify_pass_ms": [round(t * 1e3, 2) for t in tier_verify],
        "measured_cost_ratios": [round(c, 2) for c in costs_inc],
        "stage_distribution": [round(float(d), 3) for d in dist],
        "cascade_tokens_per_s": round(B / cascade_time, 1),
        "quality_preservation": round(preservation, 4),
        "lambda": round(lam, 4),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
