#!/usr/bin/env python
"""Headline benchmark: adaptive-cascade speedup vs fixed-largest-tier decoding.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} and
writes the same object to --out (default BENCH.json) so the full headline
survives driver-side tail truncation (VERDICT r3 next #6).

What it measures (single chip — the driver's environment has one TPU):
* Real decode throughput of three cascade tiers with *authentic per-layer
  shapes* of Qwen2.5-7B/32B/72B (depth/vocab reduced to fit one chip; weights
  random, quantized — timing is shape-dependent only), in both INT8 and INT4.
  Each tier is measured at depths {2, 4, 6}; the per-layer fit uses {2, 6}
  and depth 4 is HELD OUT to report the projection's interpolation error
  (projection_check — VERDICT r3 next #2a: the full-depth numbers carry a
  measured error bar instead of an unchecked extrapolation).
* ROUTING IS THE REAL SYSTEM: per-stage drafts come from real TierEngines on
  a synthetic-but-principled workload (evalx/workload.py), features from
  predict/features.py, a seed-ensemble of predict/mlp.py MLPs trained on a
  disjoint split with per-stage Platt calibration, and the DP routes on
  held-out predictions. Stage distribution and quality preservation are
  OUTPUTS of that pipeline.
* DRAFT OBSERVABILITY AT THE REFERENCE'S MEASURED LEVEL: real drafts carry a
  confidence signal (token logprobs correlate with answer quality — the
  reference's predictor draws its discrimination from exactly these
  statistics and reaches AUC 0.85 on real model outputs). Random-weight rig
  drafts carry none, which structurally denies the system information every
  real cascade predictor uses. evalx/workload.confidence_logprob_shift
  restores it: each (item, tier) draft's logprobs are shifted by a noisy
  observation of realized goodness, noise pinned so the bit alone has AUC
  1 - flip_prob = 0.85 (BASELINE.md "Predictor accuracy"). The predictor
  must still LEARN the mapping from training drafts.
* LAMBDA SELECTION HYGIENE (VERDICT r3 next #5): the eval workload is split
  into a selection half (lambda swept there, with a delta-method
  noise-margin on the quality gate) and a report half the headline is
  computed on. The committed JSON records both.
* DECOMPOSITION of the oracle gap (VERDICT r3 next #1a), all on the headline
  cell: expected-quality ceiling (best any probability-knowing direct policy
  can do), perfect-predictor walk (p_hat := p_true), Bayes-posterior walk
  (exact posterior given the calibrated observation — the realizable ceiling
  at AUC-0.85 observability), and the realized-goodness oracles (aleatoric
  ceiling). The gap between realized and expected ceilings is information
  only a coin-flip oracle has; the learned system is scored against the
  realizable ceiling.
* DUAL-CONTROLLER row: cascade/cost_optimizer.QualityGateController adapts
  lambda ONLINE (no sweep) from debiased per-request observation bits,
  target calibrated once from selection-half measurements — the serving-
  plane mechanism for sitting on the gate (VERDICT r3 next #1b).
* ROBUSTNESS: the headline recomputed over dispersion x capability source,
  each cell normalized by its own gate-constrained oracle
  (attained_fraction per cell — VERDICT r3 next #7).
* WALK-VS-MEASURED at BOTH depths (VERDICT r3 next #2b): route match and the
  timing model validated against the real ScheduledCascadePipeline on
  depth-lo AND depth-hi engines; a single per-dispatch overhead constant is
  fitted on half the samples and the held-out bias reported with and
  without it, so the depth-trend of the bias is measured, not assumed.
* Gate rows: 0.95 (headline) and 0.98 (prices the top tier back in —
  stage_distribution[2] > 0; VERDICT r3 next #8).
* mixed-INT4 stays a FOOTNOTE row gated on the measured random-weight
  agreement (pessimistic: random logits are margin-free); the committed
  AGREEMENT.json (scripts/int4_agreement_probe.py) carries the trained-
  weight bound demonstrating the collapse is a rig property, not int4's.

``quality_model: "synthetic-workload"`` — the environment has no real model
weights or eval datasets (PARITY.md), so answer goodness is realized from the
documented workload model; the routing machinery (features -> trained
predictor -> DP) is the production code path.

vs_baseline = measured speedup / 6.33 (the reference's headline speedup on
8xH100, BASELINE.md). >1.0 means beating the reference's ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _progress(msg: str, t0: float) -> None:
    print(f"[bench +{time.time() - t0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="adaptive-sd-tpu headline bench")
    ap.add_argument("--out", default="BENCH.json",
                    help="write the full result JSON here (durable artifact; "
                         "the one-line stdout JSON is unchanged)")
    args = ap.parse_args(argv)

    t_start = time.time()
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from adaptive_sd_tpu.cascade import PipelineConfig, QualityGateController
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized
    from adaptive_sd_tpu.policy import optimal_stopping_rule

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    if on_tpu:
        # Authentic per-layer widths; each tier measured at depths {2, 4, 6}:
        # the per-layer fit uses {2, 6} so decode time projects to the TRUE
        # depth (28/64/80 layers won't fit one chip together), and depth 4 is
        # held out as the projection's error check. vocab 32768 bounds embed
        # memory; weights random (timing is shape-bound). max_new 48
        # stretches the decode segment so prefill subtraction and depth
        # differencing divide tunnel jitter (~0.7 ms/dispatch); best-of-8
        # reps (dispatch noise is strictly additive).
        depths, vocab, B, max_new, prompt_len = (2, 4, 6), 32768, 8, 48, 128
        tiers = [("qwen2.5-7b", 28), ("qwen2.5-32b", 64), ("qwen2.5-72b", 80)]
        use_pallas, reps = True, 8
        # n_eval drives the delta-method noise floor of the quality gate and
        # with it the selection margin's conservatism (sigma ~ 1/sqrt(n):
        # at 2048 the sqrt(2)-sigma margin measurably over-throttled lambda
        # — report-half quality landed 0.977 against a 0.95 gate); 6144
        # costs ~5 min of extra eval drafts and cuts the margin ~40%.
        n_train, n_eval = 1536, 6144
        n_wvm, n_wvm_hi = 48, 24
        ens_seeds = (0, 1, 2, 3, 4)
    else:  # CI/CPU fallback: tiny tiers, same code path
        depths, vocab, B, max_new, prompt_len = (2, 3, 4), 2048, 4, 8, 32
        tiers = [("tiny128", 2), ("tiny128", 8), ("tiny128", 16)]
        use_pallas, reps = False, 3
        n_train, n_eval = 128, 192
        n_wvm, n_wvm_hi = 12, 6
        ens_seeds = (0,)
    n_tiers = len(tiers)
    tier_bases = [t[0] for t in tiers]
    d_lo, d_mid, d_hi = depths

    # --- per-(tier, format) timing ------------------------------------------
    # Decode: fused generate. Verify: the speculative-escalation pass
    # (verify_continue with a fully-accepted self-draft isolates the pure
    # parallel verify after subtracting residual decode).
    prompts = [[int(x) for x in np.random.default_rng(i).integers(1, vocab, prompt_len)]
               for i in range(B)]

    def measure_config(base: str, true_layers: int, bits: int, seed: int) -> dict:
        """Timing dict projected to the model's true depth from the {lo, hi}
        fit, with the held-out mid-depth prediction error, plus the raw
        depth-lo AND depth-hi measurements (the walk-vs-measured phases
        drive the real scheduled plane at both depths)."""
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
            if L == d_hi:
                tps = sum(o.num_tokens for o in outs) / gen_wall
            del eng, params

        def project(times: dict) -> tuple[float, float, float]:
            """(per-layer time, full-depth time, held-out rel err at mid)."""
            layer_t = max((times[d_hi] - times[d_lo]) / (d_hi - d_lo), 0.0)
            overhead = max(times[d_lo] - d_lo * layer_t, 0.0)
            pred_mid = overhead + d_mid * layer_t
            err_mid = (pred_mid - times[d_mid]) / max(times[d_mid], 1e-9)
            return layer_t, overhead + true_layers * layer_t, err_mid

        layer_t, full_step, step_err = project(dec_times)
        _, full_pre, pre_err = project(pre_times)
        _, full_ver, ver_err = project(ver_times)
        return {
            "layer_ms": layer_t * 1e3,
            "step": max(full_step, 1e-6),
            "prefill": full_pre,
            "verify": full_ver,
            "tps": tps,
            "proj_err_step": step_err,
            "proj_err_prefill": pre_err,
            "proj_err_verify": ver_err,
            "raw_step": dec_times[d_lo],
            "raw_prefill": pre_times[d_lo],
            "raw_verify": ver_times[d_lo],
            "raw_step_hi": dec_times[d_hi],
            "raw_prefill_hi": pre_times[d_hi],
            "raw_verify_hi": ver_times[d_hi],
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
            _progress(f"tier {i} ({base}, int{bits}) timed "
                      f"(proj err @{d_mid}: {fmt[(i, bits)]['proj_err_step']:+.3f})",
                      t_start)

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
    from adaptive_sd_tpu.evalx.oracle import (
        expected_gate_constrained_assignments,
        gate_constrained_assignments,
        oracle_assignments,
    )
    from adaptive_sd_tpu.evalx.workload import (
        CONFIDENCE_FLIP_PROB,
        confidence_logprob_shift,
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
    def build_stage_engines(depth: int, tag: str):
        engs = []
        for k, base in enumerate(tier_bases):
            d_spec = dataclasses.replace(
                scaled_spec(get_spec(base), layers=depth,
                            name=f"bench-{tag}-{k}"),
                vocab_size=vocab, tie_embeddings=False,
            )
            d_params = init_params_quantized(d_spec, jax.random.key(100 + k),
                                             bits=8)
            engs.append(TierEngine(
                d_spec, d_params, page_size=128,
                n_pages=B * ((256 + max_new) // 128 + 2) + 8,
                use_pallas=use_pallas, enable_prefix_cache=True,
            ))
        return engs

    stage_engines = build_stage_engines(d_lo, "draft")

    def tok(text: str) -> list[int]:
        return [(ord(c) % (vocab - 1)) + 1 for c in text[:256]]

    def drafts_for(items):
        """Per-stage engine outputs: (texts, lps, tok_ids) each [n][k].
        lps are the RAW engine logprobs; the per-cell confidence shift is
        applied at feature-construction time (the realized goodness differs
        per robustness cell)."""
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

    def feature_matrix(items, texts, lps, shift=None):
        rows = []
        for i, it in enumerate(items):
            for k in range(n_tiers):
                lp = lps[i][k]
                if shift is not None and lp is not None:
                    lp = np.asarray(lp, np.float64) + shift[i, k]
                rows.append(extract_features(
                    it.prompt, texts[i][k], lp, k,
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
    X_pf_train = [prompt_only_matrix(train_items, k) for k in range(n_tiers)]
    X_pf_eval = np.vstack([prompt_only_matrix(eval_items, k) for k in range(n_tiers)])
    pf_texts_train = [(it.prompt, "") for it in train_items]
    pf_texts_eval = [(it.prompt, "") for it in eval_items] * n_tiers

    # --- int4-vs-int8 greedy agreement (the mixed row's quality bill) -------
    # Same-weight engine twins (same PRNG key -> identical bf16 draw,
    # quantized to 4 vs 8 bits); agreement = accepted-prefix fraction when
    # the int4 twin verifies the int8 twin's greedy draft — exactly the
    # engine's speculative acceptance rule. Random weights give near-tie
    # (margin-free) logits, so this is a PESSIMISTIC bound; the committed
    # AGREEMENT.json (scripts/int4_agreement_probe.py, trained weights)
    # carries the structured-weight bound.
    n_agree = min(32, n_eval)
    int4_agreement = [1.0] * n_tiers   # tier 0 stays int8 in no configuration
    for k in range(n_tiers):
        if FMT_MIXED[k] != 4:
            continue
        d_spec = dataclasses.replace(
            scaled_spec(get_spec(tier_bases[k]), layers=d_lo,
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

    def train_cell(caps, dispersion, seeds=(0,)):
        """Train the predictor ensemble for one (caps, dispersion) world.

        Draft rows carry the reference-calibrated confidence observation:
        labels are the REALIZED train goodness and the draft logprobs are
        shifted by the (noisy) observation of that same realization — the
        predictor learns the signal AND its reliability from training
        drafts, then reads the eval drafts' own observations at eval time.
        Prompt-only rows stay Bernoulli(p_true): a prompt carries no draft.
        """
        rng = np.random.default_rng(0)
        p_true_train = solve_prob_matrix(train_items, caps, dispersion)
        g_train = realize_goodness(train_items, caps, dispersion=dispersion,
                                   seed=44)
        goodness = realize_goodness(eval_items, caps, dispersion=dispersion,
                                    seed=33)
        sh_tr = confidence_logprob_shift(g_train, seed=55)
        sh_ev = confidence_logprob_shift(goodness, seed=66)
        X_train = feature_matrix(train_items, tr_texts, tr_lps, sh_tr)
        X_eval = feature_matrix(eval_items, ev_texts, ev_lps, sh_ev)
        y_draft = g_train.astype(np.float32).reshape(-1)
        # K independent Bernoulli label draws per prompt-only row: the
        # prompt-conditional prior is the decision layer's binding estimate
        # (see decomposition), and averaging label noise over K draws
        # measurably sharpens it at fixed feature information
        K_PF = 3
        y_pf = np.concatenate([
            (rng.random((K_PF, n_train)) < p_true_train[None, :, k])
            .astype(np.float32).reshape(-1)
            for k in range(n_tiers)
        ])
        members, report = [], None
        for s in seeds:
            predictor = MLPQualityPredictor(n_stages=n_tiers, seed=s,
                                            hidden=(256, 128), embed_dim=32)
            rep = predictor.fit(
                np.vstack([X_train] + [np.tile(x, (K_PF, 1))
                                       for x in X_pf_train]),
                np.concatenate([y_draft, y_pf]),
                epochs=120, patience=10, seed=s, batch_size=64, calibrate=True,
                texts=text_pairs(train_items, tr_texts)
                + pf_texts_train * (n_tiers * K_PF),
            )
            members.append(predictor)
            if report is None:
                report = rep
        # No last-stage pin (pipeline parity): honest terminal estimates let
        # the DP futility-stop hopeless items at tier 0.
        p_hats = [m.predict_features(
            X_eval, texts=text_pairs(eval_items, ev_texts)
        ).reshape(n_eval, n_tiers) for m in members]
        p0s = [m.predict_features(
            X_pf_eval, texts=pf_texts_eval
        ).reshape(n_tiers, n_eval).T for m in members]
        return {
            "p_hat": np.mean(p_hats, axis=0),
            "p0": np.mean(p0s, axis=0),
            "members": members,
            "report": report,
            "goodness": goodness,
            "sh_ev": sh_ev,
            "q_largest": float(goodness[:, -1].mean()),
            "p_true_eval": solve_prob_matrix(eval_items, caps, dispersion),
            "caps": caps,
        }

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

    def simulate(walk, goodness, q_largest, lam, idx, agreement=None):
        counts = np.zeros(n_tiers, np.int64)
        q_sum = 0.0
        t_sum = 0.0
        for i in idx:
            stop, t = walk(i, lam)
            counts[stop] += 1
            q = float(goodness[i, stop])
            if agreement is not None:
                q *= agreement[stop]
            q_sum += q
            t_sum += t
        n = len(idx)
        return (counts / n, q_sum / n / q_largest, largest_time / (t_sum / n))

    def sweep(walk, goodness, q_largest, idx, gate=0.95, agreement=None):
        """Best (lam, preservation, speedup, dist) on ``idx`` subject to the
        quality gate; coarse geomspace pass then refine near the winner.
        Returns None when no lambda is feasible at the gate."""
        def run(lams, best):
            for lam in lams:
                dist, pres, spd = simulate(walk, goodness, q_largest,
                                           float(lam), idx, agreement)
                if pres >= gate and (best is None or spd > best[2]):
                    best = (float(lam), pres, spd, dist)
            return best

        best = run(np.geomspace(0.01, 10.0, 25), None)
        if best is not None:
            best = run(np.linspace(best[0] / 1.35, best[0] * 1.35, 21), best)
        return best

    def sweep_or_fallback(walk, goodness, q_largest, idx, gate=0.95,
                          agreement=None):
        best = sweep(walk, goodness, q_largest, idx, gate, agreement)
        if best is None:  # fall back to the most quality-preserving point
            cands = []
            for lam in np.geomspace(0.01, 10.0, 25):
                dist, pres, spd = simulate(walk, goodness, q_largest,
                                           float(lam), idx, agreement)
                cands.append((pres, float(lam), spd, dist))
            pres, lam, spd, dist = max(cands, key=lambda t: t[0])
            best = (lam, pres, spd, dist)
        return best

    def pres_sigma(walk, goodness, q_largest, idx, lam):
        """Delta-method standard error of the preservation ratio
        mean(g_stop)/mean(g_top) on ``idx`` — the honest noise floor of the
        quality gate at this sample size (drives the selection margin)."""
        g_stop = np.asarray([goodness[i, walk(i, lam)[0]] for i in idx],
                            np.float64)
        g_top = goodness[idx, -1].astype(np.float64)
        n = len(idx)
        ms, mt = g_stop.mean(), max(g_top.mean(), 1e-9)
        c = np.cov(g_stop, g_top)
        var = (c[0, 0] / mt**2 - 2 * ms * c[0, 1] / mt**3
               + ms**2 * c[1, 1] / mt**4) / n
        return float(np.sqrt(max(var, 0.0)))

    def oracle_rows(times, goodness, q_largest, p_true_eval, idx):
        """Perfect-knowledge bounds over the same world + timings
        (evalx/oracle.py) on ``idx``: quality-maximal direct routing, the
        gate-constrained REALIZED ceiling (aleatoric: knows the coin flips),
        the gate-constrained EXPECTED ceiling (probability knowledge only —
        the most any implementable direct policy can exploit from p alone),
        and a sequential-cascade oracle."""
        step, prefl, verf = times
        stage_plain = prefl + max_new * step
        g = goodness[idx]
        p = p_true_eval[idx]
        n = len(idx)
        ks = oracle_assignments(g)
        t_direct = float(stage_plain[ks].mean())
        q_or = float(g[np.arange(n), ks].mean()) / q_largest
        kg = gate_constrained_assignments(g, stage_plain, 0.95 * q_largest)
        t_gate = float(stage_plain[kg].mean())
        q_gate = float(g[np.arange(n), kg].mean()) / q_largest
        ke = expected_gate_constrained_assignments(
            p, stage_plain, 0.95 * float(p[:, -1].mean())
        )
        t_exp = float(stage_plain[ke].mean())
        q_exp_realized = float(g[np.arange(n), ke].mean()) / q_largest
        t_casc = []
        for row_g, row_p in zip(g, p):
            j, t = 0, float(stage_plain[0])
            if row_g.any():
                while not row_g[j] and j < n_tiers - 1:
                    acc = row_p[j]
                    t += verf[j + 1] + (1.0 - acc) * max_new * step[j + 1]
                    j += 1
            t_casc.append(t)
        return {
            "direct_speedup": round(largest_time / t_direct, 3),
            "gate_constrained_speedup": round(largest_time / t_gate, 3),
            "gate_constrained_quality": round(q_gate, 4),
            "expected_ceiling_speedup": round(largest_time / t_exp, 3),
            "expected_ceiling_realized_quality": round(q_exp_realized, 4),
            "cascade_speedup": round(largest_time / float(np.mean(t_casc)), 3),
            "stage_distribution": [round(float(np.mean(ks == s)), 3)
                                   for s in range(n_tiers)],
            "quality_preservation": round(q_or, 4),
        }

    # --- robustness matrix + headline cell ----------------------------------
    DISPERSIONS = (0.03, 0.05, 0.10)
    HEAD_DISP, HEAD_SRC = 0.05, "measured"
    times8 = times_of(FMT_INT8)
    times4 = times_of(FMT_MIXED)
    stage_plain8 = times8[1] + max_new * times8[0]

    all_idx = list(range(n_eval))
    sel_idx = all_idx[0::2]     # lambda selection half
    rep_idx = all_idx[1::2]     # report half (headline computed here)

    robustness = []
    head_cell = None
    for src in ("measured", "theory"):
        for disp in DISPERSIONS:
            caps = tier_capabilities(n_tiers, source=src)
            is_head = disp == HEAD_DISP and src == HEAD_SRC
            cell = train_cell(caps, disp,
                              seeds=ens_seeds if is_head else (ens_seeds[0],))
            walk = make_walk(times8, cell["p_hat"], cell["p0"],
                             cell["p_true_eval"], prefetch_credit=True)
            best = sweep_or_fallback(walk, cell["goodness"], cell["q_largest"],
                                     all_idx)
            lam, pres, spd, dist = best
            # per-cell normalization: this world's own gate-constrained
            # ceiling, so a reader separates routing quality from world
            # hardness (VERDICT r3 next #7)
            kg = gate_constrained_assignments(
                cell["goodness"], stage_plain8, 0.95 * cell["q_largest"]
            )
            cell_oracle = round(largest_time / float(stage_plain8[kg].mean()), 3)
            robustness.append({
                "dispersion": disp, "capability_source": src,
                "speedup": round(spd, 3), "quality_preservation": round(pres, 4),
                "lambda": round(lam, 4),
                "stage_distribution": [round(float(d), 3) for d in dist],
                "gate_constrained_oracle": cell_oracle,
                "attained_fraction": round(spd / cell_oracle, 3),
                "predictor_seeds": len(ens_seeds) if is_head else 1,
            })
            if is_head:
                head_cell = dict(cell, best_full=best, walk=walk)
            _progress(f"cell ({src}, {disp}) -> {spd:.2f}x @ {pres:.3f} "
                      f"(oracle {cell_oracle}x)", t_start)
    assert head_cell is not None

    hc = head_cell
    walk8 = hc["walk"]
    goodness, q_largest, p_true_eval = (
        hc["goodness"], hc["q_largest"], hc["p_true_eval"]
    )
    lam_full, pres_full, spd_full, dist_full = hc["best_full"]

    # --- headline: lambda selected on the selection half with a noise-margin
    # gate, frozen, then evaluated ONCE on the untouched report half --------
    best_sel = sweep_or_fallback(walk8, goodness, q_largest, sel_idx)
    sigma_sel = pres_sigma(walk8, goodness, q_largest, sel_idx, best_sel[0])
    # the sel and report halves are independent draws: the expected
    # |pres_sel - pres_rep| scale is sigma * sqrt(2); a one-sigma margin on
    # the selection gate keeps the report half at the gate in expectation
    margin_gate = 0.95 + sigma_sel * np.sqrt(2.0)
    best_m = sweep(walk8, goodness, q_largest, sel_idx, gate=margin_gate) \
        or best_sel
    lam8 = best_m[0]
    dist8, pres8, spd8 = simulate(walk8, goodness, q_largest, lam8, rep_idx)
    sigma_rep = pres_sigma(walk8, goodness, q_largest, rep_idx, lam8)
    _progress(f"headline (report half): {spd8:.3f}x @ {pres8:.4f} "
              f"(lam {lam8:.3f} from sel half, margin gate {margin_gate:.4f})",
              t_start)

    # no-prefetch credit row (same hygiene)
    walk8_nopf = make_walk(times8, hc["p_hat"], hc["p0"], p_true_eval,
                           prefetch_credit=False)
    best_m_n = sweep(walk8_nopf, goodness, q_largest, sel_idx,
                     gate=margin_gate) \
        or sweep_or_fallback(walk8_nopf, goodness, q_largest, sel_idx)
    _, pres8n, spd8n = simulate(walk8_nopf, goodness, q_largest, best_m_n[0],
                                rep_idx)

    # gate-0.98 row: prices the top tier back in (VERDICT r3 next #8)
    sigma98 = sigma_sel  # same noise scale
    best98 = sweep(walk8, goodness, q_largest, sel_idx,
                   gate=0.98 + sigma98 * np.sqrt(2.0)) \
        or sweep(walk8, goodness, q_largest, sel_idx, gate=0.98)
    gate98_row = None
    if best98 is not None:
        d98, p98, s98 = simulate(walk8, goodness, q_largest, best98[0], rep_idx)
        gate98_row = {
            "gate": 0.98,
            "speedup": round(float(s98), 3),
            "quality_preservation": round(float(p98), 4),
            "lambda": round(float(best98[0]), 4),
            "stage_distribution": [round(float(x), 3) for x in d98],
        }

    # mixed-INT4 FOOTNOTE row: faster tiers, quality pays the measured
    # (pessimistic, random-weight) agreement bill
    walk4 = make_walk(times4, hc["p_hat"], hc["p0"], p_true_eval,
                      prefetch_credit=True)
    best4 = sweep_or_fallback(walk4, goodness, q_largest, all_idx,
                              agreement=int4_agreement)
    lam4, pres4, spd4, dist4 = best4

    oracle = oracle_rows(times8, goodness, q_largest, p_true_eval, all_idx)

    # --- decomposition rows (VERDICT r3 next #1a) ---------------------------
    # perfect predictor: p_hat := p_true, p0 := p_true — same walk machinery
    walk_perf = make_walk(times8, p_true_eval, p_true_eval, p_true_eval,
                          prefetch_credit=True)
    best_perf = sweep_or_fallback(walk_perf, goodness, q_largest, all_idx)
    # perfect PRIORS only (p0 := p_true, drafts still learned): separates
    # prompt-prior error (direct entry / unvisited-tier estimates) from
    # draft-scoring error inside the learned-vs-bayes gap
    walk_pp = make_walk(times8, hc["p_hat"], p_true_eval, p_true_eval,
                        prefetch_credit=True)
    best_pp = sweep_or_fallback(walk_pp, goodness, q_largest, all_idx)
    # text-Bayes prior (p0 := E[p_true | level], level being the workload's
    # hidden complexity class): the best any PROMPT-ONLY prior can be even
    # with perfect level recovery — within-level difficulty is not expressed
    # in the text, so the perfect-prior row is NOT reachable from prompts;
    # a learned prior at or above this row has exhausted the text's
    # information (rig-internal knowledge used only for this ceiling row)
    from adaptive_sd_tpu.evalx.workload import N_LEVELS

    lev_tr = np.array([it.level for it in train_items])
    lev_ev = np.array([it.level for it in eval_items])
    p_true_tr_head = solve_prob_matrix(train_items, hc["caps"], HEAD_DISP)
    p0_tb = np.stack([
        p_true_tr_head[lev_tr == L].mean(axis=0) for L in range(N_LEVELS)
    ])[lev_ev]
    walk_tb = make_walk(times8, hc["p_hat"], p0_tb, p_true_eval,
                        prefetch_credit=True)
    best_tb = sweep_or_fallback(walk_tb, goodness, q_largest, all_idx)
    # Bayes posterior: the EXACT posterior given the calibrated observation
    # bit — the realizable ceiling at reference-level (AUC 0.85) draft
    # observability; the learned predictor is chasing THIS, not the
    # realized-goodness oracle (whose extra information is aleatoric)
    eps = CONFIDENCE_FLIP_PROB
    obs_eval = hc["sh_ev"] > 0
    post = np.where(
        obs_eval,
        p_true_eval * (1 - eps)
        / (p_true_eval * (1 - eps) + (1 - p_true_eval) * eps),
        p_true_eval * eps
        / (p_true_eval * eps + (1 - p_true_eval) * (1 - eps)),
    )
    walk_bayes = make_walk(times8, post, p_true_eval, p_true_eval,
                           prefetch_credit=True)
    best_bayes = sweep_or_fallback(walk_bayes, goodness, q_largest, all_idx)
    decomposition = {
        "learned_full_eval_speedup": round(float(spd_full), 3),
        "text_bayes_prior_speedup": round(float(best_tb[2]), 3),
        "perfect_prior_speedup": round(float(best_pp[2]), 3),
        "perfect_predictor_speedup": round(float(best_perf[2]), 3),
        "bayes_posterior_speedup": round(float(best_bayes[2]), 3),
        "expected_ceiling_speedup": oracle["expected_ceiling_speedup"],
        "realized_gate_oracle_speedup": oracle["gate_constrained_speedup"],
        "note": (
            "learned vs bayes_posterior = predictor loss (closable); "
            "bayes_posterior vs realized oracle = residual aleatoric "
            "uncertainty at AUC-0.85 observability (not closable by any "
            "implementable predictor); perfect_predictor/expected_ceiling "
            "know probabilities but no realizations. text_bayes_prior is "
            "the prompt-information limit of the PRIOR (exact "
            "level-conditional expectations): a learned system at or above "
            "it has exhausted the text, and perfect_prior is unreachable "
            "from prompts (within-level difficulty is not written down)"
        ),
    }
    _progress(f"decomposition: learned {spd_full:.2f} / bayes "
              f"{best_bayes[2]:.2f} / perfect {best_perf[2]:.2f} / realized "
              f"oracle {oracle['gate_constrained_speedup']}", t_start)

    # --- dual-controller row: lambda found ONLINE, no sweep -----------------
    # Target calibrated once from selection-half measurements (the same data
    # the sweep consumes); feedback = per-request observation bits debiased
    # by the known flip rate. Quality sensed by the controller is held at the
    # gate; realized preservation differs by the target-estimation noise
    # (reported).
    tgt_abs = float(goodness[sel_idx, -1].mean())
    tgt_se = float(np.std(goodness[sel_idx, -1].astype(float))
                   / np.sqrt(len(sel_idx)))
    ctl = QualityGateController(0.95, lam0=1.0, lr=0.03, ema_alpha=0.05,
                                warmup_obs=16)
    r_obs = np.random.default_rng(77)
    stream = rep_idx * 3   # cycle the report half: show steady state
    qs_c, ts_c, lam_traj = [], [], []
    for i in stream:
        stop, t = walk8(i, ctl.lam)
        g_bit = bool(goodness[i, stop])
        o = (not g_bit) if r_obs.random() < eps else g_bit
        q_deb = (float(o) - eps) / (1.0 - 2.0 * eps)
        ctl.update(q_deb / max(tgt_abs, 1e-9))
        lam_traj.append(ctl.lam)
        qs_c.append(float(g_bit))
        ts_c.append(t)
    n3 = len(stream) // 3
    lam_ss = np.asarray(lam_traj[-n3:])
    dual_row = {
        "mechanism": "QualityGateController dual ascent (no sweep)",
        "target_calibration": "selection-half top-tier measurements",
        "target_abs": round(tgt_abs, 4),
        "target_se": round(tgt_se, 4),
        "stream_len": len(stream),
        "steady_state_speedup": round(
            float(largest_time / np.mean(ts_c[-n3:])), 3),
        "steady_state_quality_preservation": round(
            float(np.mean(qs_c[-n3:]) / q_largest), 4),
        "sensed_quality_ema": round(float(ctl.state()["quality_ema"]), 4),
        "lambda_steady_mean": round(float(lam_ss.mean()), 4),
        "lambda_steady_sd": round(float(lam_ss.std()), 4),
        "lambda_sweep_selected": round(float(lam8), 4),
    }
    _progress(f"dual controller: {dual_row['steady_state_speedup']}x @ "
              f"{dual_row['steady_state_quality_preservation']} "
              f"(lam {dual_row['lambda_steady_mean']})", t_start)

    # --- walk-vs-measured at BOTH depths ------------------------------------
    from adaptive_sd_tpu.cascade import (
        EngineTextStage,
        ScheduledCascadePipeline,
        StageManager,
    )
    from adaptive_sd_tpu.core.types import PredictionResult, RequestContext

    def detok(ids) -> str:
        return " ".join(str(int(i)) for i in ids)

    class PlanePredictor:
        """The walk's predictor for the real scheduled plane: averages the
        ensemble members and injects the same per-(item, stage) confidence
        shift into draft logprobs that the walk's features carried (the
        engines' raw logprobs are shift-free; the rig realizes the shift at
        feature time)."""

        def __init__(self, members, shift_by_prompt):
            self.members = members
            self.shift = shift_by_prompt

        def predict(self, prompt, draft, logprobs, stage):
            if draft and logprobs is not None and prompt in self.shift:
                logprobs = np.asarray(logprobs, np.float64) \
                    + self.shift[prompt][stage]
            ps = [m.predict(prompt, draft, logprobs, stage).quality_score
                  for m in self.members]
            p = float(np.mean(ps))
            return PredictionResult(
                quality_score=p, confidence=abs(p - 0.5) * 2.0,
                predictor_name="mlp-ens",
            )

    shift_by_prompt = {
        eval_items[i].prompt: hc["sh_ev"][i] for i in range(n_eval)
    }
    plane_pred = PlanePredictor(hc["members"], shift_by_prompt)

    SCAN_STEPS = 8

    def run_wvm(engines, raw, n_samples, tag):
        """Drive the real plane over ``n_samples`` eval items; returns
        (per-request rows, route_match list). Each row: (model_t, measured_t,
        n_dispatch_estimate)."""
        raw_step, raw_prefl, raw_verf = raw
        costs_raw = [float(t / raw_step[0]) for t in raw_step]
        stages = [
            EngineTextStage(eng, tok, detok, name=f"{tag}{k}",
                            cost_per_token=costs_raw[k], stage_index=k,
                            spec_topk=0)
            for k, eng in enumerate(engines)
        ]
        walk_raw = make_walk(raw, hc["p_hat"], hc["p0"], p_true_eval,
                             prefetch_credit=False,  # serial: no idle tier
                             costs_override=np.cumsum(costs_raw))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), plane_pred,
            PipelineConfig(lam=lam8, enable_caching=False,
                           enable_prefetch=False,
                           risk_alpha=1e-6, risk_beta=1e-6),
            # WVM drives ONE request at a time: 2 lanes keep the warmup's
            # admission-graph workspaces 4x smaller than serving width —
            # three wide depth-hi tiers' weights already fill most of HBM
            max_batch=2, max_context=512, scan_steps=SCAN_STEPS,
        )
        rows, match = [], []
        try:
            # Precompile the serving-graph lattice for every tier CONCURRENTLY
            # (scheduler.warmup threads overlap the remote-compile streams) —
            # compiling the three wide depth-hi tiers serially inside the
            # first request blows any reasonable request timeout through the
            # remote-compile tunnel. One-time per shape with the persistent
            # compile cache.
            wrep = pipe.warmup(max_draft=max_new)
            _progress(
                f"wvm {tag} lattice warm: " + ", ".join(
                    f"{k}:{v['graphs']}g/{v['wall_s']}s"
                    for k, v in wrep.items()),
                t_start)
            pipe.process_request(
                RequestContext(prompt=eval_items[0].prompt, max_tokens=max_new),
                timeout=1200,
            )
            pipe._obs_n[:] = 1000  # neutralise cold-start Bayesian shrinkage
            for i in range(1, 1 + n_samples):
                res = pipe.process_request(
                    RequestContext(prompt=eval_items[i].prompt,
                                   max_tokens=max_new),
                    timeout=600,
                )
                if res.error is not None:
                    continue
                match.append(
                    walk_raw(i, lam8)[0] == res.stage_results[-1].stage_index
                )
                # the walk's timing model replayed over the plane's REALIZED
                # route and acceptances (route choice is validated separately
                # — random-weight engines' cross-tier draft agreement is a
                # property of the rig, so the timing model conditions on the
                # realized acceptances)
                route = [sr.stage_index for sr in res.stage_results]
                t = float(raw_prefl[route[0]] + max_new * raw_step[route[0]])
                n_disp = int(np.ceil(max_new / SCAN_STEPS)) + 1
                for h in range(1, len(route)):
                    k = route[h]
                    fr = (res.stage_results[h].output.finish_reason or "")
                    if fr.startswith("spec_accepted="):
                        n_acc = int(fr.split("=", 1)[1])
                        resid = max(max_new - n_acc - 1, 0)
                        t += float(raw_verf[k] + resid * raw_step[k])
                    else:
                        resid = max_new
                        t += float(raw_prefl[k] + max_new * raw_step[k])
                    n_disp += int(np.ceil(resid / SCAN_STEPS)) + 1
                rows.append((t, res.total_latency_s, n_disp))
        finally:
            pipe.shutdown()
        return rows, match

    def wvm_report(rows, match, c0=None):
        """Bias/error stats; with ``c0`` (per-dispatch overhead, seconds) the
        model adds c0 * n_dispatches."""
        if not rows:
            return None
        errs = [((t + (c0 or 0.0) * nd) - m) / max(m, 1e-9)
                for t, m, nd in rows]
        ab = np.abs(errs)
        return {
            "n": len(rows),
            "route_match_rate": round(float(np.mean(match)), 3) if match else None,
            "timing_median_rel_err": round(float(np.median(ab)), 3),
            "timing_p90_rel_err": round(float(np.percentile(ab, 90)), 3),
            "timing_median_bias": round(float(np.median(errs)), 3),
        }

    raw_lo = (
        np.asarray([fmt[(k, 8)]["raw_step"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_prefill"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_verify"] for k in range(n_tiers)]),
    )
    rows_lo, match_lo = run_wvm(stage_engines, raw_lo, n_wvm, "wvmlo")
    _progress("walk-vs-measured depth-lo done", t_start)
    # depth-hi plane: fresh engines (the timing phase's were discarded);
    # compile cache makes this cheap on reruns. Free the depth-lo engines'
    # device buffers FIRST — the three wide depth-hi tiers need most of HBM.
    import gc

    del stage_engines
    gc.collect()
    hi_engines = build_stage_engines(d_hi, "wvmhi")
    raw_hi = (
        np.asarray([fmt[(k, 8)]["raw_step_hi"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_prefill_hi"] for k in range(n_tiers)]),
        np.asarray([fmt[(k, 8)]["raw_verify_hi"] for k in range(n_tiers)]),
    )
    rows_hi, match_hi = run_wvm(hi_engines, raw_hi, n_wvm_hi, "wvmhi")
    del hi_engines
    _progress("walk-vs-measured depth-hi done", t_start)

    # fit a per-dispatch overhead constant PER DEPTH on the even-indexed
    # samples (least squares through the origin on the residuals), then
    # report the held-out (odd) bias with and without it. If the true
    # overhead is a per-dispatch constant (the ~0.7 ms tunnel dispatch),
    # c0_lo ~= c0_hi and both held-out biases vanish — which justifies the
    # headline walk's neglect of c0 at full depth (c0 * ~7 dispatches is
    # <1% of a full-depth route time).
    def fit_c0(rows):
        if not rows:
            return 0.0
        num = sum((m - t) * nd for t, m, nd in rows)
        den = sum(nd * nd for t, m, nd in rows)
        return max(num / max(den, 1e-12), 0.0)

    c0_lo = fit_c0(rows_lo[0::2])
    c0_hi = fit_c0(rows_hi[0::2])
    walk_vs_measured = {
        "depth_lo": wvm_report(rows_lo, match_lo),
        "depth_hi": wvm_report(rows_hi, match_hi),
        "dispatch_overhead_fit_ms": {
            "depth_lo": round(c0_lo * 1e3, 3),
            "depth_hi": round(c0_hi * 1e3, 3),
        },
        "depth_lo_overhead_aware_heldout": wvm_report(
            rows_lo[1::2], match_lo[1::2], c0_lo),
        "depth_hi_overhead_aware_heldout": wvm_report(
            rows_hi[1::2], match_hi[1::2], c0_hi),
        "note": (
            "bias < 0 = the model omits plane overhead (scan dispatch "
            "cadence, scheduler hops). The overhead-aware rows add the "
            "per-depth fitted dispatch constant (fit on even samples, "
            "reported on odd); c0_lo ~= c0_hi is the evidence that the "
            "omitted term is a per-dispatch constant, negligible at the "
            "projected full depths."
        ),
    }
    _progress(f"walk-vs-measured: {json.dumps(walk_vs_measured)[:160]}...",
              t_start)

    # --- headline selection --------------------------------------------------
    # same-format INT8 with split hygiene is the headline; the mixed-INT4 row
    # is a footnote unless it clears the gate WITH its (pessimistic,
    # random-weight) agreement bill paid.
    if pres4 >= 0.95 and spd4 > spd8:
        value, pres = spd4, pres4
        headline_formats = [f"int{b}" for b in FMT_MIXED]
        headline_lam, headline_dist = lam4, dist4
    else:
        value, pres = spd8, pres8
        headline_formats = [f"int{b}" for b in FMT_INT8]
        headline_lam, headline_dist = lam8, dist8

    rep = hc["report"]
    result = {
        "metric": "cascade_speedup_vs_fixed_largest",
        "value": round(float(value), 3),
        "unit": "x",
        "vs_baseline": round(float(value) / 6.33, 3),
        "platform": platform,
        "quality_model": "synthetic-workload",  # see module docstring
        "routing": "trained-mlp-ensemble+prompt-conditional-priors"
                   "+confidence-observation",
        "confidence_observation": {
            "flip_prob": CONFIDENCE_FLIP_PROB,
            "detector_auc": 1 - CONFIDENCE_FLIP_PROB,
            "calibration_source": "reference published predictor AUC 0.85 "
                                  "(BASELINE.md, FINAL_PAPER.md:232-237)",
        },
        "predictor_val_auc": round(float(rep.val_auc), 4),
        "predictor_val_r2": round(float(rep.val_r2), 4),
        "predictor_ensemble": len(ens_seeds),
        "predictor_calibration": rep.calibration_report,
        "workload": {"train": n_train, "eval": n_eval,
                     "tier_capabilities": [round(float(c), 3) for c in hc["caps"]],
                     "dispersion": HEAD_DISP,
                     "capability_source": HEAD_SRC},
        "lambda_selection": {
            "selected_on": "selection half (even eval indices)",
            "reported_on": "report half (odd eval indices)",
            "pres_sigma_sel": round(sigma_sel, 4),
            "pres_sigma_rep": round(sigma_rep, 4),
            "margin_gate": round(float(margin_gate), 4),
            "lambda": round(float(lam8), 4),
        },
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
        "projection_check": {
            "fit_depths": [d_lo, d_hi],
            "heldout_depth": d_mid,
            "step_rel_err_int8": [round(fmt[(k, 8)]["proj_err_step"], 4)
                                  for k in range(n_tiers)],
            "prefill_rel_err_int8": [round(fmt[(k, 8)]["proj_err_prefill"], 4)
                                     for k in range(n_tiers)],
            "verify_rel_err_int8": [round(fmt[(k, 8)]["proj_err_verify"], 4)
                                    for k in range(n_tiers)],
        },
        "tier_tokens_per_s_depth_hi": [round(fmt[(k, 8)]["tps"], 1)
                                       for k in range(n_tiers)],
        "measured_cost_ratios": [round(c, 2) for c in costs_inc],
        "stage_distribution": [round(float(d), 3) for d in headline_dist],
        "quality_preservation": round(float(pres), 4),
        "lambda": round(float(headline_lam), 4),
        "oracle": oracle,
        "oracle_speedup": oracle["gate_constrained_speedup"],
        "attained_fraction_of_realized_oracle": round(
            float(value) / oracle["gate_constrained_speedup"], 3),
        "attained_fraction_of_bayes_ceiling": round(
            float(value) / max(float(best_bayes[2]), 1e-9), 3),
        "decomposition": decomposition,
        "full_eval": {
            "speedup": round(float(spd_full), 3),
            "quality_preservation": round(float(pres_full), 4),
            "lambda": round(float(lam_full), 4),
            "stage_distribution": [round(float(d), 3) for d in dist_full],
            "note": "no selection/report split — the r3-comparable number",
        },
        "gate98": gate98_row,
        "dual_controller": dual_row,
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
        "mixed_int4_footnote": {
            "speedup": round(float(spd4), 3),
            "quality_preservation_with_agreement": round(float(pres4), 4),
            "lambda": round(float(lam4), 4),
            "stage_distribution": [round(float(d), 3) for d in dist4],
            "int4_agreement": [round(a, 4) for a in int4_agreement],
            "agreement_note": "verify-prefix agreement of same-weight "
                              "int4-vs-int8 twins on RANDOM weights — a "
                              "pessimistic bound (margin-free logits); see "
                              "agreement_probe for the trained-weight bound",
        },
        "robustness": robustness,
        "walk_vs_measured": walk_vs_measured,
        "cascade_tokens_per_s": round(B / (largest_time / float(value)), 1),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    # trained-weight int4 agreement probe artifact (CPU, committed)
    if os.path.exists("AGREEMENT.json"):
        try:
            with open("AGREEMENT.json") as f:
                ag = json.load(f)
            result["agreement_probe"] = {
                k: ag.get(k) for k in
                ("spec", "train_steps", "final_loss_nats",
                 "corpus_entropy_floor_nats", "trained", "random_control")
            }
        except (OSError, json.JSONDecodeError):
            pass
    # Measured under-load serving throughput (scripts/load_bench.py writes the
    # committed artifact): the per-request walk above models isolated latency;
    # the scheduled plane's cross-request batching makes system throughput a
    # separate, measured number.
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
                "measured_cost_ratios": lb.get("measured_cost_ratios"),
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
    if args.out:
        try:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=1)
            _progress(f"wrote {args.out}", t_start)
        except OSError as exc:
            _progress(f"could not write {args.out}: {exc}", t_start)


if __name__ == "__main__":
    main()
