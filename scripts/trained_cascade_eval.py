#!/usr/bin/env python
"""Trained-tier cascade: REAL generated answers, objective scorers, no
synthetic quality model (VERDICT r4 next #2).

Trains three tiny Qwen-architecture LMs of genuinely different capability
(capacity + compute scaled — models/tiny_train.py) on one shared char-level
QA corpus built from the frozen ``data/`` suites plus distractors, saves
them through the PRODUCTION checkpoint path (models/loader.save_checkpoint
-> load_params -> quantize -> TierEngine), then runs the FULL production
cascade (features -> trained MLP predictor -> DP -> speculative
verify_continue) over the held-out report half of the suites with
evalx/datasets.py's objective scorers.

What "capability" means here: all tiers train on the SAME corpus containing
the suites' canonical answers; a small tier cannot memorize them all, so
per-tier answer accuracy grades with capacity — the same coverage gradient
that separates 7B from 72B on factual recall (both saw the facts in
pretraining; the small model retains fewer). Routing exploits a real,
measured gradient; nothing about the predictor or DP sees rig internals.

Split hygiene: even-indexed items (SEL) train the predictor and select
lambda; odd-indexed items (REP) are untouched until the single report run.

Also measures the mixed-INT4 quality bill at the ANSWER level (VERDICT r4
next #4): per-tier accuracy with int4 weights vs int8 on REP — the bill
bench.py's mixed row prices against (token agreement is a pessimistic
proxy; answers survive token-level divergence).

Writes TRAINED_CASCADE.json (committed artifact; bench.py merges it).

Usage:
    python scripts/trained_cascade_eval.py                  # TPU, full
    python scripts/trained_cascade_eval.py --quick --cpu    # CI-sized
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def _progress(msg: str, t0: float) -> None:
    print(f"[trained +{time.time() - t0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="TRAINED_CASCADE.json")
    ap.add_argument("--ckpt-dir", default="checkpoints/trained_tiers")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--quick", action="store_true",
                    help="CI-sized: small recipes/steps, factual+math only")
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument("--distract", type=int, default=220,
                    help="extra generated QA items in the training corpus "
                         "(capacity pressure)")
    ap.add_argument("--seq", type=int, default=544)
    ap.add_argument("--bits", nargs="+", type=int, default=[8, 8, 8])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.cascade import (
        AdaptiveCascadePipeline,
        EngineTextStage,
        PipelineConfig,
        StageManager,
    )
    from adaptive_sd_tpu.core.types import RequestContext
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.evalx.datasets import load_frozen, score_item
    from adaptive_sd_tpu.models.loader import load_params, save_checkpoint, spec_from_checkpoint
    from adaptive_sd_tpu.models.tiny_train import (
        ANSWER_CUE,
        CharTokenizer,
        TierRecipe,
        DEFAULT_RECIPES,
        encode_qa,
        qa_corpus,
        train_lm,
    )
    from adaptive_sd_tpu.predict.features import extract_features
    from adaptive_sd_tpu.predict.mlp import MLPQualityPredictor
    from build_datasets import build_gsm

    t0 = time.time()
    platform = jax.devices()[0].platform
    cpu_dev = jax.devices("cpu")[0]

    if args.quick:
        recipes = (
            TierRecipe("trained-t0", hidden=96, n_layers=2, n_heads=2,
                       ffn=288, steps=120, head_dim=48),
            TierRecipe("trained-t1", hidden=160, n_layers=3, n_heads=4,
                       ffn=480, steps=200, head_dim=40),
            TierRecipe("trained-t2", hidden=256, n_layers=4, n_heads=4,
                       ffn=768, steps=320, head_dim=64),
        )
        datasets = ["factual-qa", "gsm-style"]
        seq_len, max_new, distract = 288, 48, min(args.distract, 60)
        n_cap, train_batch = 60, 16
    else:
        recipes = DEFAULT_RECIPES
        datasets = ["factual-qa", "gsm-style", "humaneval-style"]
        seq_len, max_new, distract = args.seq, 384, args.distract
        n_cap, train_batch = None, 32

    # --- corpus + splits ----------------------------------------------------
    items = []
    for name in datasets:
        for it in load_frozen(name)[:n_cap]:
            items.append(dict(it, dataset=name))
    sel_items = items[0::2]     # predictor training + lambda selection
    rep_items = items[1::2]     # report half (untouched until the end)
    distractors = [dict(it, dataset="distractor")
                   for it in build_gsm(n=distract, seed=777)]
    corpus_items = items + distractors

    tokz = CharTokenizer()
    pairs = qa_corpus(corpus_items)
    toks, mask = encode_qa(tokz, pairs, seq_len)
    _progress(f"corpus: {len(items)} suite items ({len(datasets)} suites) + "
              f"{len(distractors)} distractors, seq {seq_len}", t0)

    # --- train the tiers through the production checkpoint path -------------
    ckpt_base = pathlib.Path(args.ckpt_dir)
    tier_dirs, train_reports = [], []
    for k, rec in enumerate(recipes):
        steps = max(int(rec.steps * args.steps_scale), 10)
        spec = rec.spec(tokz.vocab_size, max_seq_len=max(seq_len, 512))
        params, rep = train_lm(
            spec, toks, mask, steps=steps, batch=train_batch, lr=rec.lr,
            seed=args.seed + k,
            progress=lambda m, k=k: _progress(f"tier {k}: {m}", t0),
        )
        d = save_checkpoint(params, spec, str(ckpt_base / f"stage{k}"))
        tier_dirs.append(d)
        train_reports.append(dict(rep, name=rec.name, hidden=rec.hidden,
                                  layers=rec.n_layers))
        _progress(f"tier {k} trained ({rec.name}: {rec.hidden}x{rec.n_layers}, "
                  f"{steps} steps, loss {rep['final_loss_nats']:.3f})", t0)
    del toks, mask

    # --- engines via the production load -> quantize path -------------------
    def tok_fn(s: str) -> list[int]:
        return [tokz.BOS] + tokz.encode(s + ANSWER_CUE)[-(seq_len - 1):]

    def detok_fn(ids) -> str:
        return tokz.decode(ids)

    def build_engine(d: str, bits: int) -> TierEngine:
        spec = spec_from_checkpoint(d)
        params = load_params(d, spec, bits=bits)
        return TierEngine(
            spec, params, page_size=64,
            n_pages=8 * ((seq_len + max_new) // 64 + 2) + 8,
            use_pallas=False, eos_id=tokz.EOS,
        )

    engines = [build_engine(d, b) for d, b in zip(tier_dirs, args.bits)]
    stages = [
        EngineTextStage(eng, tok_fn, detok_fn, name=recipes[k].name,
                        stage_index=k,
                        spec_topk=0)
        for k, eng in enumerate(engines)
    ]
    _progress("engines built (production load->quantize path)", t0)

    # --- per-tier generation + scoring --------------------------------------
    B = 8

    def answers_for(stage_or_engine, its, tag: str):
        """[(text, logprobs)] per item — logprobs ride along because the
        serving path's predictor sees the engine's real logprobs, and the
        training rows must be built from the identical inputs."""
        outs = []
        for i in range(0, len(its), B):
            chunk = its[i : i + B]
            prompts = [it["prompt"] for it in chunk]
            if hasattr(stage_or_engine, "generate_text"):
                res = stage_or_engine.generate_text(prompts, max_new=max_new)
                outs.extend((o.text, o.logprobs) for o in res)
            else:
                toks_b = [tok_fn(p) for p in prompts]
                res = stage_or_engine.generate(toks_b, max_new=max_new)
                outs.extend((detok_fn(o.token_ids.tolist()), o.logprobs)
                            for o in res)
        return outs

    def scores_of(its, answers) -> np.ndarray:
        return np.asarray([score_item(it, a) for it, a in zip(its, answers)],
                          np.float64)

    n_tiers = len(stages)
    sel_answers = [answers_for(stages[k], sel_items, f"sel{k}")
                   for k in range(n_tiers)]
    sel_scores = np.stack([scores_of(sel_items, [a for a, _ in sel_answers[k]])
                           for k in range(n_tiers)], axis=1)  # [n_sel, K]
    rep_answers = [answers_for(stages[k], rep_items, f"rep{k}")
                   for k in range(n_tiers)]
    rep_scores = np.stack([scores_of(rep_items, [a for a, _ in rep_answers[k]])
                           for k in range(n_tiers)], axis=1)
    _progress("per-tier accuracy SEL "
              + str([round(float(c), 3) for c in sel_scores.mean(0)])
              + " REP "
              + str([round(float(c), 3) for c in rep_scores.mean(0)]), t0)

    # --- per-tier isolated latency (cost model for lambda selection) --------
    tier_lat = []
    for k, stage in enumerate(stages):
        probe = [it["prompt"] for it in sel_items[:B]]
        stage.generate_text(probe, max_new=max_new)  # warm
        t1 = time.perf_counter()
        stage.generate_text(probe, max_new=max_new)
        tier_lat.append((time.perf_counter() - t1) / len(probe))
    measured_ratios = [t / tier_lat[0] for t in tier_lat]

    # --- predictor: trained on SEL drafts + prompt-only rows ----------------
    def rows_for(its, answers_by_tier, logprob_source=None):
        X, texts = [], []
        for i, it in enumerate(its):
            for k in range(n_tiers):
                draft, lps = answers_by_tier[k][i]
                # IDENTICAL inputs to the serving path's predictor.predict:
                # real draft logprobs, default cost. A train-time-only
                # feature (cost=ratio, logprobs=None) shifts p-hat
                # systematically at serve time (measured: routing collapsed
                # to tier 0 at 0.76 preservation).
                X.append(extract_features(
                    it["prompt"], draft, lps, k, n_stages=n_tiers,
                ))
                texts.append((it["prompt"], draft))
        return np.stack(X), texts

    # SEL splits again: the predictor fits on FIT, lambda is tuned on TUNE.
    # Tuning on the predictor's own training items reads memorised p-hats:
    # measured, SEL acc 0.995 at a lambda whose held-out preservation was
    # 0.888 (the gate cliff sat one grid step away). REP stays untouched.
    fit_items = sel_items[0::2]
    tune_items = sel_items[1::2]
    fit_answers = [[sel_answers[k][i] for i in range(0, len(sel_items), 2)]
                   for k in range(n_tiers)]
    fit_scores = sel_scores[0::2]
    X_draft, tx_draft = rows_for(fit_items, fit_answers)
    y_draft = fit_scores.reshape(-1).astype(np.float32)
    X_pf = np.stack([
        extract_features(it["prompt"], "", None, k, n_stages=n_tiers)
        for it in fit_items for k in range(n_tiers)
    ])
    tx_pf = [(it["prompt"], "") for it in fit_items for _ in range(n_tiers)]
    y_pf = y_draft.copy()
    with jax.default_device(cpu_dev):
        predictor = MLPQualityPredictor(n_stages=n_tiers, seed=args.seed,
                                        hidden=(256, 128), embed_dim=32)
        fit_rep = predictor.fit(
            np.vstack([X_draft, X_pf]), np.concatenate([y_draft, y_pf]),
            epochs=120, patience=12, batch_size=64, seed=args.seed,
            calibrate=True, texts=tx_draft + tx_pf,
        )
    _progress(f"predictor trained: val AUC {fit_rep.val_auc:.3f}", t0)

    # --- lambda selection on TUNE (real-pipeline replay; REP untouched) -----
    fixed_sel = float(sel_scores[1::2, -1].mean())
    tune_scores = sel_scores[1::2]
    # Lambda selection replays the REAL production pipeline over SEL — an
    # offline walk is a timing model, and its stop decisions drifted from
    # the production DP's (measured: walk predicted 0.957 preservation, the
    # pipeline delivered 0.840). The report half stays untouched: only the
    # frozen lambda crosses over. A one-sigma margin on the gate keeps the
    # held-out report at the 0.95 gate in expectation.
    sel_pipe = AdaptiveCascadePipeline(
        StageManager(stages), predictor,
        PipelineConfig(lam=1.0, enable_caching=False,
                       risk_alpha=1e-6, risk_beta=1e-6),
        costs=np.cumsum(measured_ratios).tolist(),
    )
    sigma_sel = float(np.sqrt(
        max(fixed_sel * (1.0 - fixed_sel), 0.04) / max(len(tune_items), 1)
    ))
    gate_sel = 0.95 * fixed_sel + np.sqrt(2.0) * sigma_sel
    best = None
    cands = []
    for lam in np.geomspace(0.1, 6.0, 7):
        sel_pipe.update_lambda(float(lam))
        sel_pipe.reset_stats()
        accs, lats = [], []
        for i, it in enumerate(tune_items):
            res = sel_pipe.process_request(RequestContext(
                prompt=it["prompt"], request_id=f"sel-{lam:.3f}-{i}",
                max_tokens=max_new,
            ))
            accs.append(score_item(it, res.text))
            lats.append(res.total_latency_s)
        acc, lat_m = float(np.mean(accs)), float(np.mean(lats))
        cands.append((acc, -lat_m, float(lam)))
        _progress(f"lambda {lam:.3f}: TUNE acc {acc:.3f} "
                  f"(gate {gate_sel:.3f}), {lat_m * 1e3:.0f} ms/req", t0)
        if acc >= gate_sel and (best is None or lat_m < best[1]):
            best = (float(lam), lat_m, acc)
    if best is None:  # no feasible point: most quality-preserving
        acc, neg_lat, lam_star = max(cands)
        best = (lam_star, -neg_lat, acc)
    lam_star = best[0]
    _progress(f"lambda selected on TUNE (real-pipeline replay): {lam_star:.3f} "
              f"(TUNE acc {best[2]:.3f} vs fixed {fixed_sel:.3f})", t0)

    # --- THE REPORT RUN: real pipeline over REP at the frozen lambda --------
    pipeline = AdaptiveCascadePipeline(
        StageManager(stages), predictor,
        # risk priors ~0: the lambda-selection walk models no Bayesian
        # shrinkage, and cold-start shrinkage toward 0.5 masks exactly the
        # low tier-0 scores that should trigger escalation
        PipelineConfig(lam=lam_star, enable_caching=False,
                       risk_alpha=1e-6, risk_beta=1e-6),
        costs=np.cumsum(measured_ratios).tolist(),
    )
    casc_scores, casc_lat, stage_counts = [], [], [0] * n_tiers
    by_ds: dict[str, list] = {}
    for i, it in enumerate(rep_items):
        res = pipeline.process_request(RequestContext(
            prompt=it["prompt"], request_id=f"rep-{i}", max_tokens=max_new,
        ))
        s = score_item(it, res.text)
        casc_scores.append(s)
        casc_lat.append(res.total_latency_s)
        stage_counts[res.final_stage] += 1
        by_ds.setdefault(it["dataset"], []).append((s, res.final_stage))
    # fixed-largest baseline: per-request for latency parity
    fixed_scores, fixed_lat = [], []
    for it in rep_items:
        t1 = time.perf_counter()
        out = stages[-1].generate_text([it["prompt"]], max_new=max_new)[0]
        fixed_lat.append(time.perf_counter() - t1)
        fixed_scores.append(score_item(it, out.text))
    n_rep = len(rep_items)
    casc_acc = float(np.mean(casc_scores))
    fixed_acc = float(np.mean(fixed_scores))
    speedup = float(np.mean(fixed_lat) / np.mean(casc_lat))
    _progress(f"REPORT: cascade {casc_acc:.3f} vs fixed {fixed_acc:.3f} "
              f"({casc_acc / max(fixed_acc, 1e-9):.3f} preservation), "
              f"{speedup:.2f}x measured", t0)

    # --- int4 answer-level bill (the mixed row's quality price) -------------
    int4_pres = [1.0] * n_tiers
    int4_acc = [None] * n_tiers
    int4_agree = [1.0] * n_tiers
    # tier 0 included: it serves most traffic, so an all-int4 configuration
    # hinges on ITS measured answer bill (bench.py's all-int4 row is gated
    # on int4_tier0_measured)
    for k in range(n_tiers):
        eng4 = build_engine(tier_dirs[k], 4)
        st4 = EngineTextStage(eng4, tok_fn, detok_fn,
                              name=f"{recipes[k].name}-int4", stage_index=k,
                              spec_topk=0)
        a4 = [a for a, _ in answers_for(st4, rep_items, f"int4-{k}")]
        acc4 = float(scores_of(rep_items, a4).mean())
        acc8 = float(rep_scores[:, k].mean())
        int4_acc[k] = acc4
        int4_pres[k] = acc4 / max(acc8, 1e-9)
        # token-level verify agreement (the engine's speculative acceptance)
        fracs = []
        for i in range(0, min(48, n_rep), B):
            chunk = rep_items[i : i + B]
            toks_b = [tok_fn(it["prompt"]) for it in chunk]
            drafts = [
                [int(x) for x in
                 engines[k].generate([tb], max_new=max_new)[0].token_ids] or [1]
                for tb in toks_b
            ]
            vouts = eng4.verify_continue(toks_b, drafts, max_new=max_new)
            fracs += [n_acc / max(len(d), 1)
                      for (_, n_acc), d in zip(vouts, drafts)]
        int4_agree[k] = float(np.mean(fracs))
        del eng4, st4
        _progress(f"tier {k} int4: acc {acc4:.3f} vs int8 {acc8:.3f} "
                  f"(answer preservation {int4_pres[k]:.3f}, token agreement "
                  f"{int4_agree[k]:.3f})", t0)

    report = {
        "metric": "trained_tiny_lm_cascade",
        "quality_model": "trained-tiny-lm",
        "platform": platform,
        "quick": bool(args.quick),
        "datasets": datasets,
        "n_sel": len(sel_items),
        "n_rep": n_rep,
        "corpus": {"suite_items": len(items), "distractors": len(distractors),
                   "seq_len": seq_len,
                   "note": "all tiers train on the same corpus containing "
                           "the suite answers; capability = memorization "
                           "coverage under capacity pressure (the 7B-vs-72B "
                           "recall gradient in miniature)"},
        "tiers": train_reports,
        "tier_bits": list(args.bits),
        "per_tier_accuracy_rep": [round(float(x), 4)
                                  for x in rep_scores.mean(0)],
        "per_tier_accuracy_sel": [round(float(x), 4)
                                  for x in sel_scores.mean(0)],
        "per_tier_latency_s": [round(float(x), 4) for x in tier_lat],
        "measured_cost_ratios": [round(float(x), 3) for x in measured_ratios],
        "predictor_val_auc": round(float(fit_rep.val_auc), 4),
        "lambda": round(lam_star, 4),
        "lambda_selection": "predictor fit on SEL-even, lambda tuned by "
                            "real-pipeline replay on SEL-odd; REP untouched "
                            "until the single report run",
        "cascade_accuracy": round(casc_acc, 4),
        "fixed_largest_accuracy": round(fixed_acc, 4),
        "quality_preservation": round(casc_acc / fixed_acc, 4)
        if fixed_acc > 0 else None,
        "stage_distribution": [round(c / n_rep, 3) for c in stage_counts],
        "cascade_speedup_measured": round(speedup, 3),
        "speedup_note": "measured wall-clock on the tiny tiers (fixed "
                        "per-dispatch overhead compresses the ratio; the "
                        "big-shape timing lives in BENCH.json)",
        "p50_latency_s": round(float(np.percentile(casc_lat, 50)), 4),
        "by_dataset": {
            ds: {
                "n": len(v),
                "cascade_accuracy": round(float(np.mean([s for s, _ in v])), 4),
                "stage_distribution": [
                    round(sum(1 for _, st in v if st == k) / len(v), 3)
                    for k in range(n_tiers)
                ],
            }
            for ds, v in sorted(by_ds.items())
        },
        "int4_answer_preservation_per_tier": [round(float(x), 4)
                                              for x in int4_pres],
        "int4_tier0_measured": int4_acc[0] is not None,
        "int4_accuracy_per_tier": [
            round(float(x), 4) if x is not None else None for x in int4_acc
        ],
        "int4_token_agreement_per_tier": [round(float(x), 4)
                                          for x in int4_agree],
        "int4_note": "answer-level preservation is the bill the mixed-int4 "
                     "bench row pays: objective score with int4 weights / "
                     "score with int8, per tier, on REP; token agreement is "
                     "the (pessimistic) speculative-acceptance rate",
        "wall_s": round(time.time() - t0, 1),
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in (
        "metric", "quality_model", "cascade_accuracy",
        "fixed_largest_accuracy", "quality_preservation",
        "cascade_speedup_measured", "stage_distribution",
        "int4_answer_preservation_per_tier", "wall_s")}))


if __name__ == "__main__":
    main()
