#!/usr/bin/env python
"""Headline benchmark: adaptive-cascade speedup vs fixed-largest-tier decoding.

DRIVER CONTRACT (VERDICT r4 next #1): stdout carries SMALL one-line JSON
headlines (<= ~1.5 KB each) — one as soon as the headline cell exists, then
updated after each later phase, final line last — so a driver that times the
run out or tail-truncates still parses a valid, honest row (the ``phase``
key says how much of the run backs it). The FULL result (decomposition,
robustness matrix, walk-vs-measured, calibration tables ...) goes to
``--out`` (default BENCH.json), never to stdout.

What it measures (single chip — the driver's environment has one TPU):
* Real decode throughput of three cascade tiers with *authentic per-layer
  shapes* of Qwen2.5-7B/32B/72B (depth/vocab reduced to fit one chip; weights
  random, quantized — timing is shape-dependent only), in both INT8 and INT4.
  INT8 tiers are measured at depths {2, 4, 6}; the per-layer fit uses {2, 6}
  and depth 4 is HELD OUT to report the projection's interpolation error
  (projection_check). INT4 configs skip the held-out depth by default
  (--full restores it) to fit the driver budget.
* ROUTING IS THE REAL SYSTEM: per-stage drafts come from real TierEngines on
  a synthetic-but-principled workload (evalx/workload.py), features from
  predict/features.py, a seed-ensemble of predict/mlp.py MLPs trained on a
  disjoint split with per-stage Platt calibration, and the DP routes on
  held-out predictions. Stage distribution and quality preservation are
  OUTPUTS of that pipeline. The walk itself is evalx/walk.CascadeWalk — the
  vectorized twin of the production pipeline semantics, equality-tested
  against the scalar reference in tests/test_walk.py.
* DRAFT OBSERVABILITY AT THE REFERENCE'S MEASURED LEVEL: drafts carry a
  confidence signal calibrated to the reference's published predictor
  discrimination (AUC 0.85) — evalx/workload.confidence_logprob_shift.
* LAMBDA SELECTION HYGIENE: lambda swept on a selection half with a
  delta-method noise margin; the headline is computed ONCE on the report
  half.
* MIXED-INT4 ECONOMICS (VERDICT r4 next #4): the mixed row's quality bill is
  priced from the TRAINED-tier artifact when committed
  (TRAINED_CASCADE.json, scripts/trained_cascade_eval.py: answer-level int4
  preservation measured on real trained-LM outputs scored by objective
  scorers) and falls back to the measured random-weight token agreement
  (pessimistic) otherwise. The ``int4_bill`` key names the source. The
  mixed row becomes the headline only if it clears the 0.95 gate WITH its
  bill paid.
* ROBUSTNESS: the headline recomputed over dispersion x capability source;
  the stdout line carries min/median/max across cells (VERDICT r4 next #9).
* DECOMPOSITION / dual-controller / gate-0.98 rows as in round 4.
* WALK-VS-MEASURED at depth-lo AND depth-hi: the real ScheduledCascadePipeline
  driven over eval items; per-dispatch overhead constant fitted on half the
  samples, held-out bias reported. Depth-hi runs 8 lanes (VERDICT r4 next
  #8): the depth-lo draft engines are freed first so the three wide depth-6
  tiers + 8-lane admission workspaces fit HBM. Sample counts are small by
  default; --full restores round-4 sizes.

``quality_model``: "synthetic-workload" for the headline cell (no real model
weights in this environment — PARITY.md); the trained_lm row (when the
committed artifact exists) is "trained-tiny-lm" — real generated answers
scored by objective scorers.

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


SMALL_KEYS = (
    "metric", "value", "unit", "vs_baseline", "platform", "phase",
    "quality_model", "quality_preservation", "lambda", "tier_formats",
    "stage_distribution", "oracle_speedup", "robustness_min",
    "robustness_median", "robustness_max", "int4_bill", "trained_lm",
    "serving_under_load_rps", "bench_wall_s",
)


def emit(result: dict, phase: str, t0: float, out_path: str | None) -> None:
    """Print the SMALL headline line to stdout and write the full result to
    --out. Called after every phase: the last stdout line a truncated run
    leaves behind is always a valid, honest headline."""
    result["phase"] = phase
    result["bench_wall_s"] = round(time.time() - t0, 1)
    small = {k: result[k] for k in SMALL_KEYS if result.get(k) is not None}
    line = json.dumps(small)
    if len(line) > 1600:  # refuse to grow past tail-truncation safety
        small = {k: small[k] for k in list(small)[:12]}
        line = json.dumps(small)
    print(line, flush=True)
    if out_path:
        try:
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
        except OSError as exc:
            _progress(f"could not write {out_path}: {exc}", t0)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="adaptive-sd-tpu headline bench")
    ap.add_argument("--out", default="BENCH.json",
                    help="write the full result JSON here (durable artifact; "
                         "stdout carries only the small headline lines)")
    ap.add_argument("--full", action="store_true",
                    help="round-4-sized run: int4 held-out depth, more "
                         "timing reps, full walk-vs-measured sample counts")
    ap.add_argument("--n-eval", type=int, default=None,
                    help="eval workload size (default 6144 on TPU)")
    ap.add_argument("--skip-wvm", action="store_true",
                    help="skip the walk-vs-measured phases entirely")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the session env pins jax to "
                         "the tunneled TPU; CI/smoke runs use tiny shapes)")
    args = ap.parse_args(argv)

    t_start = time.time()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from adaptive_sd_tpu.cascade import PipelineConfig, QualityGateController
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.evalx.walk import (
        CascadeWalk,
        pres_sigma,
        simulate,
        sweep,
        sweep_or_fallback,
    )
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    cpu_dev = jax.devices("cpu")[0]  # predictor training/eval runs here:
    # through the remote-dispatch tunnel each optimizer step pays ~0.7 ms+
    # transfer; the MLP is tiny and trains ~10x faster on the host CPU.

    if on_tpu:
        # Authentic per-layer widths; int8 tiers measured at depths {2,4,6}:
        # the per-layer fit uses {2, 6} so decode time projects to the TRUE
        # depth (28/64/80 layers won't fit one chip together), and depth 4 is
        # held out as the projection's error check. vocab 32768 bounds embed
        # memory; weights random (timing is shape-bound). max_new 48
        # stretches the decode segment so prefill subtraction and depth
        # differencing divide tunnel jitter (~0.7 ms/dispatch); best-of-reps
        # (dispatch noise is strictly additive).
        depths, vocab, B, max_new, prompt_len = (2, 4, 6), 32768, 8, 48, 128
        tiers = [("qwen2.5-7b", 28), ("qwen2.5-32b", 64), ("qwen2.5-72b", 80)]
        use_pallas, reps = True, 8 if args.full else 5
        n_train = 1536
        # driver-budget sizing (VERDICT r4 next #1): the first stdout
        # headline must land well inside the driver's timeout on a 2-CPU
        # host — 4096 eval items (report half 2048) widens pres_sigma by
        # ~22% vs round 4's 6144 (the margin gate absorbs it) and saves
        # ~3 min of draft generation; 3 ensemble seeds instead of 5 saves
        # host-CPU training minutes at <0.01 headline-AUC cost. --full
        # restores round-4 sizes.
        n_eval = args.n_eval or (6144 if args.full else 4096)
        n_wvm, n_wvm_hi = (48, 24) if args.full else (20, 8)
        ens_seeds = (0, 1, 2, 3, 4) if args.full else (0, 1, 2)
    else:  # CI/CPU fallback: tiny tiers, same code path
        depths, vocab, B, max_new, prompt_len = (2, 3, 4), 2048, 4, 8, 32
        tiers = [("tiny128", 2), ("tiny128", 8), ("tiny128", 16)]
        use_pallas, reps = False, 3
        n_train, n_eval = 128, args.n_eval or 192
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

    def measure_config(base: str, true_layers: int, bits: int, seed: int,
                       meas_depths) -> dict:
        """Timing dict projected to the model's true depth from the {lo, hi}
        fit, with the held-out mid-depth prediction error when the mid depth
        is measured, plus the raw depth-lo AND depth-hi measurements (the
        walk-vs-measured phases drive the real scheduled plane at both)."""
        dec_times, ver_times, pre_times = {}, {}, {}
        tps = 0.0
        for L in meas_depths:
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

        def project(times: dict) -> tuple[float, float, float | None]:
            """(per-layer time, full-depth time, held-out rel err at mid)."""
            layer_t = max((times[d_hi] - times[d_lo]) / (d_hi - d_lo), 0.0)
            overhead = max(times[d_lo] - d_lo * layer_t, 0.0)
            if d_mid in times:
                pred_mid = overhead + d_mid * layer_t
                err_mid = (pred_mid - times[d_mid]) / max(times[d_mid], 1e-9)
            else:
                err_mid = None
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
    # All-int4: tier 0 too — it serves ~80% of traffic, so its int4 step
    # time is the largest single economic lever. Only becomes a candidate
    # row when the TRAINED artifact carries a measured tier-0 answer bill
    # (int4_tier0_measured) — there is no honest fallback price for the
    # tier that answers most requests.
    FMT_ALL4 = [4] * n_tiers

    fmt: dict[tuple[int, int], dict] = {}   # (tier_idx, bits) -> timing dict
    for i, (base, layers) in enumerate(tiers):
        for bits in (4, 8):
            md = depths if (bits == 8 or args.full) else (d_lo, d_hi)
            fmt[(i, bits)] = measure_config(base, layers, bits, seed=i,
                                            meas_depths=md)
            pe = fmt[(i, bits)]["proj_err_step"]
            # slope clamp: a stalled depth-lo rep can exceed depth-hi,
            # collapsing the fitted per-layer time to ~0 and making the
            # tier look free (observed live: tier-1 layer_ms 0.0, ratio
            # 0.5, headline inflated to a bogus 7.8x)
            degenerate = on_tpu and fmt[(i, bits)]["layer_ms"] < 0.05
            if degenerate or (pe is not None and abs(pe) > 0.25):
                # a one-off tunnel/compile stall during one depth's timing
                # inflates the {lo, hi} fit and poisons every downstream
                # ratio — re-measure the config once and keep the retry
                # (observed: an isolated +0.76 held-out error on a tier
                # whose sibling runs read +0.04/+0.00)
                _progress(f"tier {i} int{bits} proj err {pe:+.3f} > 0.25 — "
                          "re-measuring once", t_start)
                fmt[(i, bits)] = measure_config(base, layers, bits, seed=i,
                                                meas_depths=md)
                pe = fmt[(i, bits)]["proj_err_step"]
            _progress(f"tier {i} ({base}, int{bits}) timed"
                      + (f" (proj err @{d_mid}: {pe:+.3f})" if pe is not None
                         else ""),
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

    # --- int4-vs-int8 greedy agreement (random-weight fallback bill) --------
    # Same-weight engine twins (same PRNG key -> identical bf16 draw,
    # quantized to 4 vs 8 bits); agreement = accepted-prefix fraction when
    # the int4 twin verifies the int8 twin's greedy draft — exactly the
    # engine's speculative acceptance rule. Random weights give near-tie
    # (margin-free) logits, so this is a PESSIMISTIC bound; the committed
    # TRAINED_CASCADE.json / AGREEMENT.json artifacts carry the trained-
    # weight bounds (structured logits with real top-1 margins).
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

    # --- trained-tier artifact: the mixed row's preferred quality bill ------
    # scripts/trained_cascade_eval.py measures ANSWER-level int4 preservation
    # on trained tiny-LM checkpoints (real generated answers, objective
    # scorers). Token-level agreement is a pessimistic proxy for answer
    # quality; when the committed artifact exists its measured answer
    # preservation prices the mixed row instead.
    trained_artifact = None
    int4_bill = {"source": "random-weight-token-agreement",
                 "per_tier": [round(a, 4) for a in int4_agreement]}
    mixed_bill = list(int4_agreement)
    all4_bill = None   # no honest fallback for tier 0 (see FMT_ALL4 note)
    if os.path.exists("TRAINED_CASCADE.json"):
        try:
            with open("TRAINED_CASCADE.json") as f:
                trained_artifact = json.load(f)
            tb = trained_artifact.get("int4_answer_preservation_per_tier")
            if tb and len(tb) == n_tiers and all(isinstance(x, (int, float))
                                                 for x in tb):
                mixed_bill = [min(float(x), 1.0) for x in tb]
                # mixed keeps tier 0 int8: its bill entry is 1.0 by definition
                mixed_bill[0] = 1.0
                int4_bill = {"source": "trained-lm-answer-preservation",
                             "artifact": "TRAINED_CASCADE.json",
                             "per_tier": [round(float(x), 4) for x in tb]}
                if trained_artifact.get("int4_tier0_measured"):
                    all4_bill = [min(float(x), 1.0) for x in tb]
        except (OSError, json.JSONDecodeError):
            trained_artifact = None

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

        All predictor work is pinned to the host CPU (jax.default_device):
        through the TPU tunnel each tiny optimizer step pays a dispatch
        round trip and training a member takes minutes; on CPU it is
        seconds, with identical math.
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
        with jax.default_device(cpu_dev):
            for s in seeds:
                predictor = MLPQualityPredictor(n_stages=n_tiers, seed=s,
                                                hidden=(256, 128), embed_dim=32)
                rep = predictor.fit(
                    np.vstack([X_train] + [np.tile(x, (K_PF, 1))
                                           for x in X_pf_train]),
                    np.concatenate([y_draft, y_pf]),
                    epochs=120, patience=10, seed=s, batch_size=64,
                    calibrate=True,
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
        """evalx/walk.CascadeWalk with this run's PipelineConfig knobs —
        vectorized, equality-tested against the scalar reference walk."""
        step, prefl, verf = times
        return CascadeWalk(
            step=step, prefill=prefl, verify=verf,
            p_hat=p_hat, p0=p0_eval, p_true=p_true_eval, max_new=max_new,
            skip_threshold=SKIP_T, min_draft_quality=MIN_DRAFT_Q,
            prefetch_threshold=PF_T, chain_threshold=CHAIN_T,
            prefetch_credit=prefetch_credit, costs=costs_override,
        )

    def sim(walk, goodness, q_largest, lam, idx, agreement=None):
        return simulate(walk, goodness, q_largest, largest_time, lam, idx,
                        agreement)

    def swp(walk, goodness, q_largest, idx, gate=0.95, agreement=None):
        return sweep(walk, goodness, q_largest, largest_time, idx, gate,
                     agreement)

    def swp_fb(walk, goodness, q_largest, idx, gate=0.95, agreement=None):
        return sweep_or_fallback(walk, goodness, q_largest, largest_time, idx,
                                 gate, agreement)

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

    # --- HEADLINE CELL FIRST (early driver line), then the rest -------------
    DISPERSIONS = (0.03, 0.05, 0.10)
    HEAD_DISP, HEAD_SRC = 0.05, "measured"
    times8 = times_of(FMT_INT8)
    times4 = times_of(FMT_MIXED)
    stage_plain8 = times8[1] + max_new * times8[0]

    all_idx = list(range(n_eval))
    sel_idx = all_idx[0::2]     # lambda selection half
    rep_idx = all_idx[1::2]     # report half (headline computed here)

    head_caps = tier_capabilities(n_tiers, source=HEAD_SRC)
    hc = train_cell(head_caps, HEAD_DISP, seeds=ens_seeds)
    walk8 = make_walk(times8, hc["p_hat"], hc["p0"], hc["p_true_eval"],
                      prefetch_credit=True)
    goodness, q_largest, p_true_eval = (
        hc["goodness"], hc["q_largest"], hc["p_true_eval"]
    )
    best_full = swp_fb(walk8, goodness, q_largest, all_idx)
    lam_full, pres_full, spd_full, dist_full = best_full
    _progress(f"headline cell trained: full-eval {spd_full:.3f}x @ "
              f"{pres_full:.4f}", t_start)

    # lambda selected on the selection half with a noise-margin gate, frozen,
    # then evaluated ONCE on the untouched report half
    best_sel = swp_fb(walk8, goodness, q_largest, sel_idx)
    sigma_sel = pres_sigma(walk8, goodness, q_largest, sel_idx, best_sel[0])
    # the sel and report halves are independent draws: the expected
    # |pres_sel - pres_rep| scale is sigma * sqrt(2); a one-sigma margin on
    # the selection gate keeps the report half at the gate in expectation
    margin_gate = 0.95 + sigma_sel * np.sqrt(2.0)
    best_m = swp(walk8, goodness, q_largest, sel_idx, gate=margin_gate) \
        or best_sel
    lam8 = best_m[0]
    dist8, pres8, spd8 = sim(walk8, goodness, q_largest, lam8, rep_idx)
    sigma_rep = pres_sigma(walk8, goodness, q_largest, rep_idx, lam8)
    _progress(f"headline (report half): {spd8:.3f}x @ {pres8:.4f} "
              f"(lam {lam8:.3f} from sel half, margin gate {margin_gate:.4f})",
              t_start)

    # mixed-INT4 row: faster tiers, quality pays the bill (trained answer
    # preservation when the artifact exists, else random-weight agreement).
    # Same split hygiene as the int8 headline.
    walk4 = make_walk(times4, hc["p_hat"], hc["p0"], p_true_eval,
                      prefetch_credit=True)
    best4_sel = swp(walk4, goodness, q_largest, sel_idx, gate=margin_gate,
                    agreement=mixed_bill) \
        or swp_fb(walk4, goodness, q_largest, sel_idx, agreement=mixed_bill)
    lam4 = best4_sel[0]
    dist4, pres4, spd4 = sim(walk4, goodness, q_largest, lam4, rep_idx,
                             agreement=mixed_bill)
    _progress(f"mixed-int4 (report half, bill={int4_bill['source']}): "
              f"{spd4:.3f}x @ {pres4:.4f}", t_start)

    # all-int4 row: only with a measured tier-0 bill from the trained
    # artifact. Same split hygiene.
    all4_row = None
    if all4_bill is not None:
        times_a4 = times_of(FMT_ALL4)
        walk_a4 = make_walk(times_a4, hc["p_hat"], hc["p0"], p_true_eval,
                            prefetch_credit=True)
        besta_sel = swp(walk_a4, goodness, q_largest, sel_idx,
                        gate=margin_gate, agreement=all4_bill) \
            or swp_fb(walk_a4, goodness, q_largest, sel_idx,
                      agreement=all4_bill)
        lam_a4 = besta_sel[0]
        dist_a4, pres_a4, spd_a4 = sim(walk_a4, goodness, q_largest, lam_a4,
                                       rep_idx, agreement=all4_bill)
        all4_row = {
            "speedup": round(float(spd_a4), 3),
            "quality_preservation_with_bill": round(float(pres_a4), 4),
            "lambda": round(float(lam_a4), 4),
            "stage_distribution": [round(float(d), 3) for d in dist_a4],
            "bill_per_tier": [round(float(x), 4) for x in all4_bill],
            "bill_source": "trained-lm-answer-preservation (tier 0 measured)",
        }
        _progress(f"all-int4 (report half): {spd_a4:.3f}x @ {pres_a4:.4f}",
                  t_start)

    oracle = oracle_rows(times8, goodness, q_largest, p_true_eval, all_idx)

    # headline selection: same-format INT8 unless a quantized row clears the
    # gate WITH its bill paid and is faster
    value, pres = spd8, pres8
    headline_formats = [f"int{b}" for b in FMT_INT8]
    headline_lam, headline_dist = lam8, dist8
    if pres4 >= 0.95 and spd4 > value:
        value, pres = spd4, pres4
        headline_formats = [f"int{b}" for b in FMT_MIXED]
        headline_lam, headline_dist = lam4, dist4
    if all4_row is not None and all4_row["quality_preservation_with_bill"] \
            >= 0.95 and all4_row["speedup"] > value:
        value, pres = all4_row["speedup"], all4_row["quality_preservation_with_bill"]
        headline_formats = [f"int{b}" for b in FMT_ALL4]
        headline_lam = all4_row["lambda"]
        headline_dist = all4_row["stage_distribution"]

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
                     "tier_capabilities": [round(float(c), 3) for c in head_caps],
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
            "step_rel_err_int8": [
                round(fmt[(k, 8)]["proj_err_step"], 4)
                if fmt[(k, 8)]["proj_err_step"] is not None else None
                for k in range(n_tiers)
            ],
            "prefill_rel_err_int8": [
                round(fmt[(k, 8)]["proj_err_prefill"], 4)
                if fmt[(k, 8)]["proj_err_prefill"] is not None else None
                for k in range(n_tiers)
            ],
            "verify_rel_err_int8": [
                round(fmt[(k, 8)]["proj_err_verify"], 4)
                if fmt[(k, 8)]["proj_err_verify"] is not None else None
                for k in range(n_tiers)
            ],
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
        "full_eval": {
            "speedup": round(float(spd_full), 3),
            "quality_preservation": round(float(pres_full), 4),
            "lambda": round(float(lam_full), 4),
            "stage_distribution": [round(float(d), 3) for d in dist_full],
            "note": "no selection/report split — the r3-comparable number",
        },
        "same_format_int8": {
            "speedup": round(float(spd8), 3),
            "quality_preservation": round(float(pres8), 4),
            "lambda": round(float(lam8), 4),
            "stage_distribution": [round(float(d), 3) for d in dist8],
        },
        "mixed_int4": {
            "speedup": round(float(spd4), 3),
            "quality_preservation_with_bill": round(float(pres4), 4),
            "lambda": round(float(lam4), 4),
            "stage_distribution": [round(float(d), 3) for d in dist4],
            "bill_source": int4_bill["source"],
            # the bill actually APPLIED to this row (tier 0 is int8 here,
            # so its entry is 1.0 by definition; int4_bill carries the
            # artifact's raw per-tier int4 measurements)
            "bill_per_tier": [round(float(x), 4) for x in mixed_bill],
            "raw_token_agreement_random_weights": [round(a, 4)
                                                   for a in int4_agreement],
        },
        "int4_bill": int4_bill["source"],
    }
    if all4_row is not None:
        result["all_int4"] = all4_row
    if trained_artifact is not None:
        tl = trained_artifact
        result["trained_lm"] = {
            "quality_model": "trained-tiny-lm",
            "speedup_measured": tl.get("cascade_speedup_measured"),
            "quality_preservation": tl.get("quality_preservation"),
            "fixed_largest_accuracy": tl.get("fixed_largest_accuracy"),
            "cascade_accuracy": tl.get("cascade_accuracy"),
            "stage_distribution": tl.get("stage_distribution"),
            "artifact": "TRAINED_CASCADE.json",
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
                        "dispatch_ms",
                    )}
                    for p in lb.get("passes", [])
                ],
            }
            result["serving_under_load_rps"] = max(
                (p.get("achieved_rps") or 0.0
                 for p in lb.get("passes", [])), default=None)
        except (OSError, json.JSONDecodeError):
            pass

    emit(result, "headline", t_start, args.out)

    # --- robustness matrix (headline cell reused; 5 more 1-seed cells) ------
    robustness = []
    for src in ("measured", "theory"):
        for disp in DISPERSIONS:
            is_head = disp == HEAD_DISP and src == HEAD_SRC
            if is_head:
                cell, cwalk = hc, walk8
            else:
                caps = tier_capabilities(n_tiers, source=src)
                cell = train_cell(caps, disp, seeds=(ens_seeds[0],))
                cwalk = make_walk(times8, cell["p_hat"], cell["p0"],
                                  cell["p_true_eval"], prefetch_credit=True)
            best = swp_fb(cwalk, cell["goodness"], cell["q_largest"], all_idx)
            lam, presx, spd, dist = best
            # per-cell normalization: this world's own gate-constrained
            # ceiling, so a reader separates routing quality from world
            # hardness
            kg = gate_constrained_assignments(
                cell["goodness"], stage_plain8, 0.95 * cell["q_largest"]
            )
            cell_oracle = round(largest_time / float(stage_plain8[kg].mean()), 3)
            robustness.append({
                "dispersion": disp, "capability_source": src,
                "speedup": round(spd, 3), "quality_preservation": round(presx, 4),
                "lambda": round(lam, 4),
                "stage_distribution": [round(float(d), 3) for d in dist],
                "gate_constrained_oracle": cell_oracle,
                "attained_fraction": round(spd / cell_oracle, 3),
                "predictor_seeds": len(ens_seeds) if is_head else 1,
            })
            _progress(f"cell ({src}, {disp}) -> {spd:.2f}x @ {presx:.3f} "
                      f"(oracle {cell_oracle}x)", t_start)
    spds = sorted(r["speedup"] for r in robustness)
    result["robustness"] = robustness
    result["robustness_min"] = spds[0]
    result["robustness_median"] = round(float(np.median(spds)), 3)
    result["robustness_max"] = spds[-1]
    emit(result, "robustness", t_start, args.out)

    # --- decomposition rows -------------------------------------------------
    # perfect predictor: p_hat := p_true, p0 := p_true — same walk machinery
    walk_perf = make_walk(times8, p_true_eval, p_true_eval, p_true_eval,
                          prefetch_credit=True)
    best_perf = swp_fb(walk_perf, goodness, q_largest, all_idx)
    # perfect PRIORS only (p0 := p_true, drafts still learned): separates
    # prompt-prior error (direct entry / unvisited-tier estimates) from
    # draft-scoring error inside the learned-vs-bayes gap
    walk_pp = make_walk(times8, hc["p_hat"], p_true_eval, p_true_eval,
                        prefetch_credit=True)
    best_pp = swp_fb(walk_pp, goodness, q_largest, all_idx)
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
    best_tb = swp_fb(walk_tb, goodness, q_largest, all_idx)
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
    best_bayes = swp_fb(walk_bayes, goodness, q_largest, all_idx)
    result["decomposition"] = {
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
    result["attained_fraction_of_bayes_ceiling"] = round(
        float(value) / max(float(best_bayes[2]), 1e-9), 3)
    _progress(f"decomposition: learned {spd_full:.2f} / bayes "
              f"{best_bayes[2]:.2f} / perfect {best_perf[2]:.2f} / realized "
              f"oracle {oracle['gate_constrained_speedup']}", t_start)

    # no-prefetch credit row (same hygiene as the headline)
    walk8_nopf = make_walk(times8, hc["p_hat"], hc["p0"], p_true_eval,
                           prefetch_credit=False)
    best_m_n = swp(walk8_nopf, goodness, q_largest, sel_idx,
                   gate=margin_gate) \
        or swp_fb(walk8_nopf, goodness, q_largest, sel_idx)
    _, pres8n, spd8n = sim(walk8_nopf, goodness, q_largest, best_m_n[0],
                           rep_idx)
    result["prefetch"] = {
        "enabled_default": bool(cfg_defaults.enable_prefetch),
        "threshold": PF_T,
        "chain_threshold": CHAIN_T,
        "walk_assumes_idle_capacity": True,
        "speedup_without_prefetch_credit": round(float(spd8n), 3),
        "quality_without_prefetch_credit": round(float(pres8n), 4),
    }

    # gate-0.98 row: prices the top tier back in
    best98 = swp(walk8, goodness, q_largest, sel_idx,
                 gate=0.98 + sigma_sel * np.sqrt(2.0)) \
        or swp(walk8, goodness, q_largest, sel_idx, gate=0.98)
    if best98 is not None:
        d98, p98, s98 = sim(walk8, goodness, q_largest, best98[0], rep_idx)
        result["gate98"] = {
            "gate": 0.98,
            "speedup": round(float(s98), 3),
            "quality_preservation": round(float(p98), 4),
            "lambda": round(float(best98[0]), 4),
            "stage_distribution": [round(float(x), 3) for x in d98],
        }

    # --- dual-controller row: lambda found ONLINE, no sweep -----------------
    # Target calibrated once from selection-half measurements (the same data
    # the sweep consumes); feedback = per-request observation bits debiased
    # by the known flip rate (an UNBIASED signal — see the attach() bias
    # warning in cascade/cost_optimizer.py). Quality sensed by the controller
    # is held at the gate; realized preservation differs by the target-
    # estimation noise (reported).
    tgt_abs = float(goodness[sel_idx, -1].mean())
    tgt_se = float(np.std(goodness[sel_idx, -1].astype(float))
                   / np.sqrt(len(sel_idx)))
    ctl = QualityGateController(0.95, lam0=1.0, lr=0.03, ema_alpha=0.05,
                                warmup_obs=16)
    r_obs = np.random.default_rng(77)
    stream = rep_idx * 3   # cycle the report half: show steady state
    qs_c, ts_c, lam_traj = [], [], []
    for i in stream:
        stop, t = walk8.run_one(i, ctl.lam)   # scalar path: lam varies
        g_bit = bool(goodness[i, stop])
        o = (not g_bit) if r_obs.random() < eps else g_bit
        q_deb = (float(o) - eps) / (1.0 - 2.0 * eps)
        ctl.update(q_deb / max(tgt_abs, 1e-9))
        lam_traj.append(ctl.lam)
        qs_c.append(float(g_bit))
        ts_c.append(t)
    n3 = len(stream) // 3
    lam_ss = np.asarray(lam_traj[-n3:])
    result["dual_controller"] = {
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
    _progress(f"dual controller: "
              f"{result['dual_controller']['steady_state_speedup']}x @ "
              f"{result['dual_controller']['steady_state_quality_preservation']}",
              t_start)
    result["cascade_tokens_per_s"] = round(B / (largest_time / float(value)), 1)
    emit(result, "analysis", t_start, args.out)

    # --- walk-vs-measured at BOTH depths ------------------------------------
    if not args.skip_wvm:
        from adaptive_sd_tpu.cascade import (
            EngineTextStage,
            ScheduledCascadePipeline,
            StageManager,
        )
        from adaptive_sd_tpu.core.types import PredictionResult, RequestContext

        def detok(ids) -> str:
            return " ".join(str(int(i)) for i in ids)

        class PlanePredictor:
            """The walk's predictor for the real scheduled plane: averages
            the ensemble members and injects the same per-(item, stage)
            confidence shift into draft logprobs that the walk's features
            carried (the engines' raw logprobs are shift-free; the rig
            realizes the shift at feature time)."""

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

        def run_wvm(engines, raw, n_samples, tag, lanes):
            """Drive the real plane over ``n_samples`` eval items; returns
            (per-request rows, route_match list). Each row: (model_t,
            measured_t, n_dispatch_estimate)."""
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
                max_batch=lanes, max_context=512, scan_steps=SCAN_STEPS,
            )
            rows, match = [], []
            try:
                # Precompile the serving-graph lattice for every tier
                # CONCURRENTLY (scheduler.warmup threads overlap the
                # remote-compile streams). One-time per shape with the
                # persistent compile cache.
                wrep = pipe.warmup(max_draft=max_new)
                _progress(
                    f"wvm {tag} lattice warm: " + ", ".join(
                        f"{k}:{v['graphs']}g/{v['wall_s']}s"
                        for k, v in wrep.items()),
                    t_start)
                pipe.process_request(
                    RequestContext(prompt=eval_items[0].prompt,
                                   max_tokens=max_new),
                    timeout=1200,
                )
                pipe._obs_n[:] = 1000  # neutralise cold-start Bayes shrinkage
                for i in range(1, 1 + n_samples):
                    res = pipe.process_request(
                        RequestContext(prompt=eval_items[i].prompt,
                                       max_tokens=max_new),
                        timeout=600,
                    )
                    if res.error is not None:
                        continue
                    match.append(
                        walk_raw.run_one(i, lam8)[0]
                        == res.stage_results[-1].stage_index
                    )
                    # the walk's timing model replayed over the plane's
                    # REALIZED route and acceptances (route choice is
                    # validated separately — random-weight engines'
                    # cross-tier draft agreement is a property of the rig,
                    # so the timing model conditions on realized acceptances)
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
            """Bias/error stats; with ``c0`` (per-dispatch overhead, seconds)
            the model adds c0 * n_dispatches."""
            if not rows:
                return None
            errs = [((t + (c0 or 0.0) * nd) - m) / max(m, 1e-9)
                    for t, m, nd in rows]
            ab = np.abs(errs)
            return {
                "n": len(rows),
                "route_match_rate": round(float(np.mean(match)), 3)
                if match else None,
                "timing_median_rel_err": round(float(np.median(ab)), 3),
                "timing_p90_rel_err": round(float(np.percentile(ab, 90)), 3),
                "timing_median_bias": round(float(np.median(errs)), 3),
            }

        raw_lo = (
            np.asarray([fmt[(k, 8)]["raw_step"] for k in range(n_tiers)]),
            np.asarray([fmt[(k, 8)]["raw_prefill"] for k in range(n_tiers)]),
            np.asarray([fmt[(k, 8)]["raw_verify"] for k in range(n_tiers)]),
        )
        rows_lo, match_lo = run_wvm(stage_engines, raw_lo, n_wvm, "wvmlo",
                                    lanes=2)
        _progress("walk-vs-measured depth-lo done", t_start)
        # depth-hi plane: fresh engines (the timing phase's were discarded);
        # compile cache makes this cheap on reruns. Free the depth-lo
        # engines' device buffers FIRST — the three wide depth-6 tiers need
        # most of HBM; with them gone the 8-lane admission workspaces fit
        # (VERDICT r4 next #8).
        import gc

        del stage_engines
        gc.collect()
        hi_engines = build_stage_engines(d_hi, "wvmhi")
        raw_hi = (
            np.asarray([fmt[(k, 8)]["raw_step_hi"] for k in range(n_tiers)]),
            np.asarray([fmt[(k, 8)]["raw_prefill_hi"] for k in range(n_tiers)]),
            np.asarray([fmt[(k, 8)]["raw_verify_hi"] for k in range(n_tiers)]),
        )
        rows_hi, match_hi = run_wvm(hi_engines, raw_hi, n_wvm_hi, "wvmhi",
                                    lanes=8)
        del hi_engines
        _progress("walk-vs-measured depth-hi done", t_start)

        # fit a per-dispatch overhead constant PER DEPTH on the even-indexed
        # samples (least squares through the origin on the residuals), then
        # report the held-out (odd) bias with and without it. If the true
        # overhead is a per-dispatch constant (the ~0.7 ms tunnel dispatch),
        # c0_lo ~= c0_hi and both held-out biases vanish — which justifies
        # the headline walk's neglect of c0 at full depth (c0 * ~7 dispatches
        # is <1% of a full-depth route time).
        def fit_c0(rows):
            if not rows:
                return 0.0
            num = sum((m - t) * nd for t, m, nd in rows)
            den = sum(nd * nd for t, m, nd in rows)
            return max(num / max(den, 1e-12), 0.0)

        c0_lo = fit_c0(rows_lo[0::2])
        c0_hi = fit_c0(rows_hi[0::2])
        result["walk_vs_measured"] = {
            "depth_lo": wvm_report(rows_lo, match_lo),
            "depth_hi": wvm_report(rows_hi, match_hi),
            "depth_hi_lanes": 8,
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
        _progress(
            f"walk-vs-measured: "
            f"{json.dumps(result['walk_vs_measured']['depth_lo'])[:120]}...",
            t_start)

    emit(result, "final", t_start, args.out)


if __name__ == "__main__":
    main()
