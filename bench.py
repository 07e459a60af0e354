#!/usr/bin/env python
"""Headline benchmark: adaptive-cascade speedup vs fixed-largest-tier decoding.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

What it measures (single chip — the driver's environment has one TPU):
* Real decode throughput of three cascade tiers with *authentic per-layer
  shapes* of Qwen2.5-7B/32B/72B (depth/vocab reduced to fit one chip; weights
  random, quantized — timing is shape-dependent only), measured in BOTH INT8
  and INT4 weight formats.
* ROUTING IS THE REAL SYSTEM: per-stage drafts come from real TierEngines on
  a synthetic-but-principled workload (evalx/workload.py — difficulty
  observable in the prompt text; tier capability from the Qwen2.5 published
  MMLU table), features from predict/features.py, the predict/mlp.py MLP is
  trained on a disjoint split with per-stage Platt calibration, and the DP
  routes on held-out predictions. Stage distribution and quality preservation
  are OUTPUTS of that pipeline.
* The walk mirrors cascade/pipeline.py + cascade/scheduled.py DEFAULTS
  exactly: prompt-conditional per-stage priors, direct entry, tier skipping,
  speculative verify escalation gated on min_draft_quality_for_verify, and
  speculative prefix prefetch including CHAIN prefetch on every escalation
  hop (warm-page exposure capped by elapsed time). The headline is reported
  both with and without prefetch credit; prefetch is enabled by default in
  PipelineConfig, and the walk assumes idle target-tier capacity grants it.
* HEADLINE is SAME-FORMAT: an all-INT8 cascade against the fixed-72B INT8
  baseline (the reference compares same-precision,
  /root/reference/configs/qwen3_models.yaml:8-52). The faster mixed-INT4
  cascade is reported as a secondary row whose quality pays a MEASURED
  int4-vs-int8 greedy-agreement bill (verify_continue prefix agreement on
  same-weight engine twins — random weights, so a pessimistic bound). If the
  mixed row still clears the 95% quality gate it becomes the headline.
* ORACLE BOUND: perfect-knowledge routing over the same realized goodness
  and measured timings — the attainable ceiling that separates routing loss
  from kernel speed. Three bounds: quality-maximal direct (cheapest good
  tier; items NO tier solves stop at tier 0 — futility), the
  GATE-CONSTRAINED ceiling (max speed s.t. mean quality >= 95% of
  always-largest — the benchmark objective's true upper bound, reported as
  oracle_speedup), and a sequential-cascade oracle.
* ROBUSTNESS: the headline recomputed over dispersion {0.03, 0.05, 0.10} x
  capability source {measured, theory} (drafts and timings shared; predictor
  retrained per cell).
* WALK-VS-MEASURED: the walk validated against the real
  ScheduledCascadePipeline on the depth-2 engines, split into its two
  claims — route_match_rate (does the plane stop where the walk predicts?)
  and timing_*_rel_err (the walk's timing model replayed over the plane's
  realized route/acceptances vs measured latency; realized engine draft
  agreement is conditioned on because random-weight engines agree
  near-never across tiers, a property of the rig, not the model).

``quality_model: "synthetic-workload"`` — the environment has no real model
weights or eval datasets (PARITY.md), so answer goodness is realized from the
documented workload model; the routing machinery (features -> trained
predictor -> DP) is the production code path.

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


def _progress(msg: str, t0: float) -> None:
    print(f"[bench +{time.time() - t0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from adaptive_sd_tpu.cascade import PipelineConfig
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized
    from adaptive_sd_tpu.policy import optimal_stopping_rule

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    if on_tpu:
        # Authentic per-layer widths; each tier measured at depth 2 and 6 so
        # per-layer decode time projects to the TRUE depth (28/64/80 layers
        # won't fit one chip together). vocab 32768 bounds embed memory;
        # weights random (timing is shape-bound). max_new 48 stretches the
        # decode segment so prefill subtraction and depth differencing divide
        # tunnel jitter (~0.7 ms/dispatch); best-of-8 reps (dispatch noise is
        # strictly additive).
        depths, vocab, B, max_new, prompt_len = (2, 6), 32768, 8, 48, 128
        tiers = [("qwen2.5-7b", 28), ("qwen2.5-32b", 64), ("qwen2.5-72b", 80)]
        use_pallas, reps = True, 8
        n_train, n_eval = 640, 1280
        n_wvm = 48          # walk-vs-measured sample
    else:  # CI/CPU fallback: tiny tiers, same code path
        depths, vocab, B, max_new, prompt_len = (2, 4), 2048, 4, 8, 32
        tiers = [("tiny128", 2), ("tiny128", 8), ("tiny128", 16)]
        use_pallas, reps = False, 3
        n_train, n_eval = 128, 192
        n_wvm = 12
    n_tiers = len(tiers)
    tier_bases = [t[0] for t in tiers]

    # --- per-(tier, format) timing ------------------------------------------
    # Decode: fused generate. Verify: the speculative-escalation pass
    # (verify_continue with a fully-accepted self-draft isolates the pure
    # parallel verify after subtracting residual decode).
    prompts = [[int(x) for x in np.random.default_rng(i).integers(1, vocab, prompt_len)]
               for i in range(B)]

    def measure_config(base: str, true_layers: int, bits: int, seed: int) -> dict:
        """Timing dict projected to the model's true depth, plus the raw
        depth-lo measurements (the walk-vs-measured phase drives the real
        scheduled plane on depth-lo engines)."""
        dec_times, ver_times, pre_times = {}, {}, {}
        tps = 0.0
        for L in depths:
            spec = dataclasses.replace(
                scaled_spec(get_spec(base), layers=L,
                            name=f"bench-{base}-b{bits}-l{L}"),
                vocab_size=vocab, tie_embeddings=False,
            )
            params = init_params_quantized(spec, jax.random.key(seed), bits=bits)
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
            # budget=1 reuses the SAME bucketed graph (traced budget): no
            # extra compile, isolates prefill+overhead cleanly
            gen_one, _ = timed(lambda: eng.generate(prompts, max_new=1))
            step = max((gen_wall - gen_one) / (max_new - 1), 1e-6)
            dec_times[L] = step
            pre_times[L] = max(gen_one - step, 0.0)
            drafts = [o.token_ids.tolist() or [1] for o in outs]
            ver_wall, vouts = timed(
                lambda: eng.verify_continue(prompts, drafts, max_new=max_new)
            )
            # Subtract residual decode of rejected suffixes (random weights
            # -> fragile argmax -> partial acceptance) to isolate verify.
            residual_steps = max_new - min(n_acc for _, n_acc in vouts)
            ver_times[L] = max(ver_wall - residual_steps * step, step)
            if L == depths[-1]:
                tps = sum(o.num_tokens for o in outs) / gen_wall
            del eng, params

        d_lo, d_hi = depths

        def project(times: dict) -> tuple[float, float]:
            layer_t = max((times[d_hi] - times[d_lo]) / (d_hi - d_lo), 0.0)
            overhead = max(times[d_lo] - d_lo * layer_t, 0.0)
            return layer_t, overhead + true_layers * layer_t

        layer_t, full_step = project(dec_times)
        return {
            "layer_ms": layer_t * 1e3,
            "step": max(full_step, 1e-6),
            "prefill": project(pre_times)[1],
            "verify": project(ver_times)[1],
            "tps": tps,
            "raw_step": dec_times[d_lo],
            "raw_prefill": pre_times[d_lo],
            "raw_verify": ver_times[d_lo],
        }

    FMT_INT8 = [8] * n_tiers
    # The fast mixed path: tier 0 (the draft tier serving most traffic, where
    # accuracy matters most) stays INT8; the upper tiers stream packed INT4
    # at roughly half the bytes per layer.
    FMT_MIXED = [8] + [4] * (n_tiers - 1)

    fmt: dict[tuple[int, int], dict] = {}   # (tier_idx, bits) -> timing dict
    for i, (base, layers) in enumerate(tiers):
        for bits in sorted({8, FMT_MIXED[i]}):
            fmt[(i, bits)] = measure_config(base, layers, bits, seed=i)
            _progress(f"tier {i} ({base}, int{bits}) timed", t_start)

    def times_of(bits_list):
        step = np.asarray([fmt[(k, b)]["step"] for k, b in enumerate(bits_list)])
        prefl = np.asarray([fmt[(k, b)]["prefill"] for k, b in enumerate(bits_list)])
        verf = np.asarray([fmt[(k, b)]["verify"] for k, b in enumerate(bits_list)])
        return step, prefl, verf
    base_step = fmt[(n_tiers - 1, 8)]["step"]
    base_prefill = fmt[(n_tiers - 1, 8)]["prefill"]
    # Fair baseline: fixed-largest (INT8, BASELINE.md) pays its own prefill.
    largest_time = base_prefill + base_step * max_new

    # --- workload + per-stage drafts from the REAL engines ------------------
    from adaptive_sd_tpu.evalx.workload import (
        make_workload,
        realize_goodness,
        solve_prob_matrix,
        tier_capabilities,
    )
    from adaptive_sd_tpu.predict.features import extract_features
    from adaptive_sd_tpu.predict.mlp import MLPQualityPredictor

    train_items = make_workload(n_train, seed=11)
    eval_items = make_workload(n_eval, seed=22)

    # Per-stage draft engines (depth-lo shapes per tier, int8 — the fused
    # graphs are warm from the timing phase). Production fidelity: stage k
    # scores its OWN output, so every (item, stage) feature row is built from
    # THAT stage's draft and logprobs. prefix caches on: the walk-vs-measured
    # phase drives the real scheduled plane (prefetch needs them).
    stage_engines = []
    for k, base in enumerate(tier_bases):
        d_spec = dataclasses.replace(
            scaled_spec(get_spec(base), layers=depths[0], name=f"bench-draft-{k}"),
            vocab_size=vocab, tie_embeddings=False,
        )
        d_params = init_params_quantized(d_spec, jax.random.key(100 + k), bits=8)
        stage_engines.append(TierEngine(
            d_spec, d_params, page_size=128,
            n_pages=B * ((256 + max_new) // 128 + 2) + 8, use_pallas=use_pallas,
            enable_prefix_cache=True,
        ))

    def tok(text: str) -> list[int]:
        return [(ord(c) % (vocab - 1)) + 1 for c in text[:256]]

    def drafts_for(items):
        """Per-stage engine outputs: (texts, lps, tok_ids) each [n][k]."""
        texts = [[None] * n_tiers for _ in items]
        lps = [[None] * n_tiers for _ in items]
        tok_ids = [[None] * n_tiers for _ in items]
        for i in range(0, len(items), B):
            chunk = items[i : i + B]
            toks = [tok(it.prompt) for it in chunk]
            for k, eng in enumerate(stage_engines):
                outs = eng.generate(toks, max_new=max_new)
                for j, o in enumerate(outs):
                    ids = o.token_ids.tolist()
                    tok_ids[i + j][k] = ids
                    texts[i + j][k] = " ".join(str(t) for t in ids)
                    lps[i + j][k] = o.logprobs
        return texts, lps, tok_ids

    def text_pairs(items, texts):
        return [(it.prompt, texts[i][k])
                for i, it in enumerate(items) for k in range(n_tiers)]

    # Incremental cost context for the feature rows (stage one-hot carries
    # the stage; cost adds the measured ratio) — int8 ratios.
    step8 = times_of(FMT_INT8)[0]
    costs_inc = [float(t / step8[0]) for t in step8]

    def feature_matrix(items, texts, lps):
        rows = []
        for i, it in enumerate(items):
            for k in range(n_tiers):
                rows.append(extract_features(
                    it.prompt, texts[i][k], lps[i][k], k,
                    n_stages=n_tiers, cost=costs_inc[k],
                ))
        return np.stack(rows)

    def prompt_only_matrix(items, stage: int):
        return np.stack([
            extract_features(it.prompt, "", None, stage, n_stages=n_tiers)
            for it in items
        ])

    _progress("timing done; generating per-stage drafts", t_start)
    tr_texts, tr_lps, _tr_ids = drafts_for(train_items)
    _progress(f"train drafts done ({n_train} items x {n_tiers} stages)", t_start)
    ev_texts, ev_lps, ev_ids = drafts_for(eval_items)
    _progress(f"eval drafts done ({n_eval} items x {n_tiers} stages)", t_start)
    X_train = feature_matrix(train_items, tr_texts, tr_lps)
    X_eval = feature_matrix(eval_items, ev_texts, ev_lps)
    X_pf_train = [prompt_only_matrix(train_items, k) for k in range(n_tiers)]
    X_pf_eval = np.vstack([prompt_only_matrix(eval_items, k) for k in range(n_tiers)])
    pf_texts_train = [(it.prompt, "") for it in train_items]
    pf_texts_eval = [(it.prompt, "") for it in eval_items] * n_tiers

    # --- int4-vs-int8 greedy agreement (the mixed row's quality bill) -------
    # Same-weight engine twins (same PRNG key -> identical bf16 draw,
    # quantized to 4 vs 8 bits); agreement = accepted-prefix fraction when
    # the int4 twin verifies the int8 twin's greedy draft — exactly the
    # engine's speculative acceptance rule. Random weights give near-tie
    # logits, so this is a PESSIMISTIC bound for real checkpoints.
    n_agree = min(32, n_eval)
    int4_agreement = [1.0] * n_tiers   # tier 0 stays int8 in no configuration
    for k in range(n_tiers):
        if FMT_MIXED[k] != 4:
            continue
        d_spec = dataclasses.replace(
            scaled_spec(get_spec(tier_bases[k]), layers=depths[0],
                        name=f"bench-agree-{k}"),
            vocab_size=vocab, tie_embeddings=False,
        )
        p4 = init_params_quantized(d_spec, jax.random.key(100 + k), bits=4)
        eng4 = TierEngine(
            d_spec, p4, page_size=128,
            n_pages=B * ((256 + max_new) // 128 + 2) + 8, use_pallas=use_pallas,
        )
        fracs = []
        for i in range(0, n_agree, B):
            idx = list(range(i, min(i + B, n_agree)))
            toks = [tok(eval_items[j].prompt) for j in idx]
            drafts = [ev_ids[j][k] or [1] for j in idx]
            vouts = eng4.verify_continue(toks, drafts, max_new=max_new)
            fracs += [n_acc / max(len(d), 1) for (_, n_acc), d in zip(vouts, drafts)]
        int4_agreement[k] = float(np.mean(fracs))
        del eng4, p4
    _progress(f"int4 agreement measured: {[round(a, 3) for a in int4_agreement]}",
              t_start)

    # --- routing cell: train predictor + faithful pipeline walk -------------
    cfg_defaults = PipelineConfig()
    SKIP_T = cfg_defaults.skip_prior_threshold
    MIN_DRAFT_Q = cfg_defaults.min_draft_quality_for_verify
    PF_T = cfg_defaults.prefetch_threshold
    CHAIN_T = cfg_defaults.chain_prefetch_threshold

    def train_cell(caps, dispersion, seed=0):
        """Train the predictor for one (caps, dispersion) world; returns
        (p_hat [n_eval, n], p0_eval [n_eval, n], report)."""
        rng = np.random.default_rng(seed)
        p_true_train = solve_prob_matrix(train_items, caps, dispersion)
        y_draft = (rng.random(p_true_train.shape) < p_true_train).astype(
            np.float32).reshape(-1)
        # prompt-only rows for EVERY stage (predict/data.py parity): the
        # prompt-conditional priors and prefetch decisions score these
        y_pf = np.concatenate([
            (rng.random(n_train) < p_true_train[:, k]).astype(np.float32)
            for k in range(n_tiers)
        ])
        predictor = MLPQualityPredictor(n_stages=n_tiers, seed=0)
        report = predictor.fit(
            np.vstack([X_train, *X_pf_train]),
            np.concatenate([y_draft, y_pf]),
            epochs=60, patience=8, seed=0, batch_size=64, calibrate=True,
            texts=text_pairs(train_items, tr_texts) + pf_texts_train * n_tiers,
        )
        # No last-stage pin (pipeline parity): the Bellman forces stopping at
        # the last stage structurally; honest terminal estimates let the DP
        # futility-stop hopeless items at tier 0 instead of paying the whole
        # cascade for an answer no tier can give.
        p_hat = predictor.predict_features(
            X_eval, texts=text_pairs(eval_items, ev_texts)
        ).reshape(n_eval, n_tiers)
        p0 = predictor.predict_features(
            X_pf_eval, texts=pf_texts_eval
        ).reshape(n_tiers, n_eval).T
        return p_hat, p0, predictor, report

    def make_walk(times, p_hat, p0_eval, p_true_eval, *, prefetch_credit: bool,
                  costs_override=None):
        """Faithful per-item walk of cascade/pipeline.py process_request +
        cascade/scheduled.py prefetch under DEFAULT PipelineConfig: direct
        entry from prompt-conditional estimates, prompt-conditional
        unvisited-tier priors in the DP, tier skipping, speculative verify
        escalation gated on min_draft_quality_for_verify, arrival + chain
        prefix prefetch with warm-page exposure capped by elapsed time."""
        step, prefl, verf = times
        stage_plain = prefl + max_new * step
        if costs_override is not None:
            costs_norm = np.asarray(costs_override, np.float64)
            costs_norm = costs_norm / costs_norm[-1]
        else:
            costs_norm = np.cumsum(stage_plain)
            costs_norm = costs_norm / costs_norm[-1]

        def transition(i, j, k, t_now, warm):
            acc = p_true_eval[i, j]
            spec_ok = p_hat[i, j] >= MIN_DRAFT_Q
            if k in warm:
                exposed = max(prefl[k] - (t_now - warm[k]), 0.0)
                spec = exposed + max(verf[k] - prefl[k], step[k]) \
                    + (1.0 - acc) * max_new * step[k]
                plain = exposed + max_new * step[k]
            else:
                spec = verf[k] + (1.0 - acc) * max_new * step[k]
                plain = prefl[k] + max_new * step[k]
            return spec if spec_ok else plain

        def walk(i, lam):
            p0 = p0_eval[i]
            # direct entry (pipeline._entry_tier)
            k0, _ = optimal_stopping_rule(p0, costs_norm, lam)
            e = 0
            while e < k0 and p0[e] < SKIP_T:
                e += 1
            e = min(e, n_tiers - 1)
            warm: dict[int, float] = {}
            if prefetch_credit and e + 1 < n_tiers and p0[e] < PF_T:
                warm[e + 1] = 0.0   # arrival prefetch fires at submit
            t = float(stage_plain[e])
            j = e
            visited = {j: float(p_hat[i, j])}
            while True:
                p_vec = np.asarray(
                    [visited.get(s, p0[s]) for s in range(n_tiers)]
                )
                k, _ = optimal_stopping_rule(p_vec, costs_norm, lam)
                if k <= j or j == n_tiers - 1:
                    return j, t
                nxt = j + 1
                while nxt < k and p0[nxt] < SKIP_T:
                    nxt += 1
                nxt = min(nxt, n_tiers - 1)
                if (prefetch_credit and nxt + 1 < n_tiers
                        and p0[nxt] < CHAIN_T):
                    warm[nxt + 1] = t   # chain prefetch fires at submit time
                t += transition(i, j, nxt, t, warm)
                j = nxt
                visited[j] = float(p_hat[i, j])

        return walk

    def simulate(walk, goodness, q_largest, lam, agreement=None):
        counts = np.zeros(n_tiers, np.int64)
        q_sum = 0.0
        t_sum = 0.0
        for i in range(n_eval):
            stop, t = walk(i, lam)
            counts[stop] += 1
            q = float(goodness[i, stop])
            if agreement is not None:
                q *= agreement[stop]
            q_sum += q
            t_sum += t
        return (counts / n_eval, q_sum / n_eval / q_largest,
                largest_time / (t_sum / n_eval))

    def sweep(walk, goodness, q_largest, agreement=None):
        """Best (lam, preservation, speedup, dist) subject to the >=95%
        quality gate; coarse geomspace pass then refine near the winner."""
        def run(lams, best):
            for lam in lams:
                dist, pres, spd = simulate(walk, goodness, q_largest,
                                           float(lam), agreement)
                if pres >= 0.95 and (best is None or spd > best[2]):
                    best = (float(lam), pres, spd, dist)
            return best

        best = run(np.geomspace(0.01, 10.0, 25), None)
        if best is not None:
            best = run(np.linspace(best[0] / 1.35, best[0] * 1.35, 21), best)
        if best is None:  # fall back to the most quality-preserving point
            cands = []
            for lam in np.geomspace(0.01, 10.0, 25):
                dist, pres, spd = simulate(walk, goodness, q_largest,
                                           float(lam), agreement)
                cands.append((pres, float(lam), spd, dist))
            pres, lam, spd, dist = max(cands, key=lambda t: t[0])
            best = (lam, pres, spd, dist)
        return best

    def oracle_rows(times, goodness, q_largest, p_true_eval):
        """Perfect-knowledge bounds over the same world + timings
        (evalx/oracle.py): quality-maximal direct routing (cheapest good
        tier; futility items stop at tier 0), the gate-constrained ceiling
        (max speed s.t. mean quality >= 95% of always-largest — the
        benchmark objective's true upper bound), and a sequential-cascade
        oracle (escalate until good via speculative transitions; futility
        items stop at tier 0 immediately)."""
        from adaptive_sd_tpu.evalx.oracle import (
            gate_constrained_assignments,
            oracle_assignments,
        )

        step, prefl, verf = times
        stage_plain = prefl + max_new * step
        ks = oracle_assignments(goodness)
        t_direct = float(stage_plain[ks].mean())
        q_or = float(goodness[np.arange(n_eval), ks].mean()) / q_largest
        kg = gate_constrained_assignments(
            goodness, stage_plain, 0.95 * q_largest
        )
        t_gate = float(stage_plain[kg].mean())
        q_gate = float(goodness[np.arange(n_eval), kg].mean()) / q_largest
        t_casc = []
        for i in range(n_eval):
            j, t = 0, float(stage_plain[0])
            if goodness[i].any():
                while not goodness[i, j] and j < n_tiers - 1:
                    acc = p_true_eval[i, j]
                    t += verf[j + 1] + (1.0 - acc) * max_new * step[j + 1]
                    j += 1
            t_casc.append(t)
        dist = [float(np.mean(ks == s)) for s in range(n_tiers)]
        return {
            "direct_speedup": round(largest_time / t_direct, 3),
            "gate_constrained_speedup": round(largest_time / t_gate, 3),
            "gate_constrained_quality": round(q_gate, 4),
            "cascade_speedup": round(largest_time / float(np.mean(t_casc)), 3),
            "stage_distribution": [round(d, 3) for d in dist],
            "quality_preservation": round(q_or, 4),
        }

    # --- robustness matrix + headline cells ---------------------------------
    DISPERSIONS = (0.03, 0.05, 0.10)
    HEAD_DISP, HEAD_SRC = 0.05, "measured"
    times8 = times_of(FMT_INT8)
    times4 = times_of(FMT_MIXED)

    robustness = []
    head_cell = None
    for src in ("measured", "theory"):
        for disp in DISPERSIONS:
            caps = tier_capabilities(n_tiers, source=src)
            p_hat, p0, predictor, report = train_cell(caps, disp)
            goodness = realize_goodness(eval_items, caps, dispersion=disp, seed=33)
            q_largest = float(goodness[:, -1].mean())
            p_true_eval = solve_prob_matrix(eval_items, caps, disp)
            walk = make_walk(times8, p_hat, p0, p_true_eval, prefetch_credit=True)
            lam, pres, spd, dist = sweep(walk, goodness, q_largest)
            robustness.append({
                "dispersion": disp, "capability_source": src,
                "speedup": round(spd, 3), "quality_preservation": round(pres, 4),
                "lambda": round(lam, 4),
            })
            if disp == HEAD_DISP and src == HEAD_SRC:
                head_cell = dict(
                    p_hat=p_hat, p0=p0, predictor=predictor, report=report,
                    goodness=goodness, q_largest=q_largest,
                    p_true_eval=p_true_eval, caps=caps,
                    best=(lam, pres, spd, dist),
                )
            _progress(f"cell ({src}, {disp}) -> {spd:.2f}x @ {pres:.3f}", t_start)
    assert head_cell is not None

    hc = head_cell
    lam8, pres8, spd8, dist8 = hc["best"]
    walk8 = make_walk(times8, hc["p_hat"], hc["p0"], hc["p_true_eval"],
                      prefetch_credit=True)
    walk8_nopf = make_walk(times8, hc["p_hat"], hc["p0"], hc["p_true_eval"],
                           prefetch_credit=False)
    lam8n, pres8n, spd8n, _ = sweep(walk8_nopf, hc["goodness"], hc["q_largest"])

    # mixed-INT4 row: faster tiers, quality pays the measured agreement bill
    walk4 = make_walk(times4, hc["p_hat"], hc["p0"], hc["p_true_eval"],
                      prefetch_credit=True)
    lam4, pres4, spd4, dist4 = sweep(walk4, hc["goodness"], hc["q_largest"],
                                     agreement=int4_agreement)
    oracle = oracle_rows(times8, hc["goodness"], hc["q_largest"],
                         hc["p_true_eval"])
    _progress("routing cells + oracle done; walk-vs-measured", t_start)

    # --- walk-vs-measured: the walk's predictions against the REAL scheduled
    # plane on the depth-lo engines (same predictor, same lambda) ------------
    from adaptive_sd_tpu.cascade import (
        EngineTextStage,
        ScheduledCascadePipeline,
        StageManager,
    )
    from adaptive_sd_tpu.core.types import RequestContext

    def detok(ids) -> str:
        return " ".join(str(int(i)) for i in ids)

    raw_times = (
        np.asarray([fmt[(k, 8)]["raw_step"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_prefill"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_verify"] for k in range(n_tiers)]),
    )
    wvm_stages = [
        EngineTextStage(eng, tok, detok, name=f"wvm{k}",
                        cost_per_token=costs_inc[k], stage_index=k, spec_topk=0)
        for k, eng in enumerate(stage_engines)
    ]
    # Route prediction uses the SAME normalised cost vector the plane's DP
    # sees (StageManager cumsums cost_per_token = costs_inc), so route
    # disagreement isolates predictor/decision divergence, not cost-vector
    # mismatch.
    walk_raw = make_walk(raw_times, hc["p_hat"], hc["p0"], hc["p_true_eval"],
                         prefetch_credit=False,  # serial requests: no idle tier
                         costs_override=np.cumsum(costs_inc))
    wvm_pipe = ScheduledCascadePipeline(
        StageManager(wvm_stages), hc["predictor"],
        PipelineConfig(lam=lam8, enable_caching=False, enable_prefetch=False,
                       risk_alpha=1e-6, risk_beta=1e-6),
        max_batch=B, max_context=512, scan_steps=8,
    )

    def model_route_time(stage_results) -> float:
        """The walk's timing model replayed over the plane's REALIZED route
        and acceptances. The walk proper predicts expected escalation cost
        from the workload's solve probabilities; the engines' realized draft
        agreement is a different random variable (random weights agree
        near-never across tiers), so validating the TIMING model requires
        conditioning on the realized route — route choice itself is
        validated separately (route_match_rate)."""
        step, prefl, verf = raw_times
        route = [sr.stage_index for sr in stage_results]
        t = float(prefl[route[0]] + max_new * step[route[0]])
        for h in range(1, len(route)):
            k = route[h]
            fr = (stage_results[h].output.finish_reason or "")
            if fr.startswith("spec_accepted="):
                n_acc = int(fr.split("=", 1)[1])
                t += float(verf[k]
                           + max(max_new - n_acc - 1, 0) * step[k])
            else:
                t += float(prefl[k] + max_new * step[k])
        return t

    wvm_errs, wvm_route = [], []
    try:
        # warm the lane graphs, then time each request in isolation
        wvm_pipe.process_request(
            RequestContext(prompt=eval_items[0].prompt, max_tokens=max_new),
            timeout=600,
        )
        wvm_pipe._obs_n[:] = 1000  # neutralise cold-start Bayesian shrinkage
        for i in range(1, 1 + n_wvm):
            res = wvm_pipe.process_request(
                RequestContext(prompt=eval_items[i].prompt, max_tokens=max_new),
                timeout=600,
            )
            if res.error is not None:
                continue
            wvm_route.append(
                walk_raw(i, lam8)[0] == res.stage_results[-1].stage_index
            )
            model_t = model_route_time(res.stage_results)
            wvm_errs.append((model_t - res.total_latency_s)
                            / max(res.total_latency_s, 1e-9))
    finally:
        wvm_pipe.shutdown()
    wvm_abs = np.abs(wvm_errs) if wvm_errs else None
    walk_vs_measured = {
        "n": len(wvm_errs),
        "route_match_rate": round(float(np.mean(wvm_route)), 3) if wvm_route else None,
        "timing_median_rel_err": round(float(np.median(wvm_abs)), 3) if wvm_errs else None,
        "timing_p90_rel_err": round(float(np.percentile(wvm_abs, 90)), 3) if wvm_errs else None,
        # signed: negative = the model omits plane overhead (scan dispatch
        # cadence, scheduler hops, predictor walltime) — expected to shrink
        # at authentic depths where compute dominates
        "timing_median_bias": round(float(np.median(wvm_errs)), 3) if wvm_errs else None,
    }
    _progress(f"walk-vs-measured done: {walk_vs_measured}", t_start)

    # --- headline selection --------------------------------------------------
    # same-format INT8 is the default headline (same-precision comparison,
    # reference configs/qwen3_models.yaml:8-52); the mixed-INT4 row takes
    # over only if it clears the quality gate WITH its measured agreement
    # bill paid.
    if pres4 >= 0.95 and spd4 > spd8:
        value, pres, lam, dist = spd4, pres4, lam4, dist4
        headline_formats = [f"int{b}" for b in FMT_MIXED]
    else:
        value, pres, lam, dist = spd8, pres8, lam8, dist8
        headline_formats = [f"int{b}" for b in FMT_INT8]

    rep = hc["report"]
    result = {
        "metric": "cascade_speedup_vs_fixed_largest",
        "value": round(float(value), 3),
        "unit": "x",
        "vs_baseline": round(float(value) / 6.33, 3),
        "platform": platform,
        "quality_model": "synthetic-workload",  # see module docstring
        "routing": "trained-mlp-predictor+prompt-conditional-priors",
        "predictor_val_auc": round(float(rep.val_auc), 4),
        "predictor_val_r2": round(float(rep.val_r2), 4),
        "predictor_calibration": rep.calibration_report,
        "workload": {"train": n_train, "eval": n_eval,
                     "tier_capabilities": [round(float(c), 3) for c in hc["caps"]],
                     "dispersion": HEAD_DISP,
                     "capability_source": HEAD_SRC},
        "tier_formats": headline_formats,
        "baseline_format": "int8",
        "baseline_step_ms": round(base_step * 1e3, 2),
        "baseline_prefill_ms": round(base_prefill * 1e3, 2),
        "per_layer_step_ms_int8": [round(fmt[(k, 8)]["layer_ms"], 3)
                                   for k in range(n_tiers)],
        "per_layer_step_ms_int4": [
            round(fmt[(k, 4)]["layer_ms"], 3) if (k, 4) in fmt else None
            for k in range(n_tiers)
        ],
        "projected_full_depth_step_ms": [round(t * 1e3, 2) for t in times8[0]],
        "projected_prefill_ms": [round(t * 1e3, 2) for t in times8[1]],
        "projected_verify_pass_ms": [round(t * 1e3, 2) for t in times8[2]],
        "tier_tokens_per_s_depth_hi": [round(fmt[(k, 8)]["tps"], 1)
                                       for k in range(n_tiers)],
        "measured_cost_ratios": [round(c, 2) for c in costs_inc],
        "stage_distribution": [round(float(d), 3) for d in dist],
        "quality_preservation": round(float(pres), 4),
        "lambda": round(float(lam), 4),
        "oracle": oracle,
        # The benchmark objective is max speed s.t. quality >= 95%; the
        # gate-constrained oracle is its true ceiling (the quality-maximal
        # direct oracle leaves quality slack on the table).
        "oracle_speedup": oracle["gate_constrained_speedup"],
        "attained_fraction_of_oracle": round(
            float(value) / oracle["gate_constrained_speedup"], 3),
        "prefetch": {
            "enabled_default": bool(cfg_defaults.enable_prefetch),
            "threshold": PF_T,
            "chain_threshold": CHAIN_T,
            "walk_assumes_idle_capacity": True,
            "speedup_without_prefetch_credit": round(float(spd8n), 3),
            "quality_without_prefetch_credit": round(float(pres8n), 4),
        },
        "same_format_int8": {
            "speedup": round(float(spd8), 3),
            "quality_preservation": round(float(pres8), 4),
            "lambda": round(float(lam8), 4),
            "stage_distribution": [round(float(d), 3) for d in dist8],
        },
        "mixed_int4": {
            "speedup": round(float(spd4), 3),
            "quality_preservation_with_agreement": round(float(pres4), 4),
            "lambda": round(float(lam4), 4),
            "stage_distribution": [round(float(d), 3) for d in dist4],
            "int4_agreement": [round(a, 4) for a in int4_agreement],
            "agreement_note": "verify-prefix agreement of same-weight "
                              "int4-vs-int8 twins on RANDOM weights — a "
                              "pessimistic bound folded into the quality gate",
        },
        "robustness": robustness,
        "walk_vs_measured": walk_vs_measured,
        "cascade_tokens_per_s": round(B / (largest_time / float(value)), 1),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    # Measured under-load serving throughput (scripts/load_bench.py writes the
    # committed artifact): the per-request walk above models isolated latency;
    # the scheduled plane's cross-request batching makes system throughput a
    # separate, measured number (VERDICT r2 #10).
    load_paths = sorted(
        p for p in os.listdir(".") if p.startswith("LOADBENCH_") and p.endswith(".json")
    )
    if load_paths:
        try:
            reports = []
            for p in load_paths:
                with open(p) as f:
                    reports.append((p, json.load(f)))
            # prefer the highest-offered-rate normal-capacity run (pressure
            # runs exist to demonstrate preemption, not throughput; low-rate
            # runs measure latency, not capacity)
            normal = [r for r in reports if not r[1].get("page_pressure")]
            path, lb = max(
                normal or reports,
                key=lambda r: max(
                    (p.get("offered_rate_rps", 0.0)
                     for p in r[1].get("passes", [])),
                    default=0.0,
                ),
            )
            result["serving_under_load"] = {
                "artifact": path,
                "platform": lb.get("platform"),
                "passes": [
                    {k: p.get(k) for k in (
                        "prefetch", "offered_rate_rps", "achieved_rps",
                        "serving_tokens_per_s", "latency_p50_s",
                        "latency_p95_s", "latency_p99_s", "preemptions",
                    )}
                    for p in lb.get("passes", [])
                ],
            }
        except (OSError, json.JSONDecodeError):
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
