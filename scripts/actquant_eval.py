#!/usr/bin/env python
"""Accuracy bill of the W8A8 act-quant decode path on TRAINED weights.

VERDICT r4 next #6: if on-the-fly activation quantization (int8 activations
on the native int8 MXU, ops/matmul_q.quantized_matmul_w8a8) is to become the
default int8 decode path, its quality cost must be measured on trained
weights, not asserted. This loads the checkpoints written by
scripts/trained_cascade_eval.py, builds int8 engines with act_quant on/off,
and scores REAL generated answers on the frozen report half with the
objective scorers — the same answer-level bill the int4 row pays.

Writes ACTQUANT.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default="checkpoints/trained_tiers")
    ap.add_argument("--out", default="ACTQUANT.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--max-new", type=int, default=384)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.evalx.datasets import load_frozen, score_item
    from adaptive_sd_tpu.models.loader import load_params, spec_from_checkpoint
    from adaptive_sd_tpu.models.tiny_train import ANSWER_CUE, CharTokenizer

    t0 = time.time()
    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    tokz = CharTokenizer()
    tiers = sorted(pathlib.Path(args.ckpt_dir).glob("stage*"))
    if not tiers:
        raise SystemExit(
            f"no checkpoints under {args.ckpt_dir} — run "
            "scripts/trained_cascade_eval.py first"
        )

    datasets = ["factual-qa", "gsm-style"] if args.quick \
        else ["factual-qa", "gsm-style", "humaneval-style"]
    items = []
    for name in datasets:
        items.extend(dict(it, dataset=name) for it in load_frozen(name))
    rep_items = items[1::2]
    if args.quick:
        rep_items = rep_items[:40]
    max_new = 48 if args.quick else args.max_new
    seq_len = 544
    B = 8

    def tok_fn(s: str) -> list[int]:
        return [tokz.BOS] + tokz.encode(s + ANSWER_CUE)[-(seq_len - 1):]

    def build(d: str, aq: bool) -> TierEngine:
        spec = spec_from_checkpoint(str(d))
        params = load_params(str(d), spec, bits=8)
        return TierEngine(
            spec, params, page_size=64,
            n_pages=8 * ((seq_len + max_new) // 64 + 2) + 8,
            use_pallas=on_dev, eos_id=tokz.EOS, act_quant=aq,
        )

    def answers(eng) -> list[str]:
        outs = []
        for i in range(0, len(rep_items), B):
            chunk = rep_items[i : i + B]
            toks = [tok_fn(it["prompt"]) for it in chunk]
            res = eng.generate(toks, max_new=max_new)
            outs.extend(tokz.decode(o.token_ids.tolist()) for o in res)
        return outs

    report = {"metric": "actquant_answer_bill", "platform": platform,
              "n_rep": len(rep_items), "datasets": datasets, "tiers": []}
    for k, d in enumerate(tiers):
        row = {"tier": k, "dir": str(d)}
        accs = {}
        agree = None
        drafts8 = None
        for aq in (False, True):
            eng = build(d, aq)
            a = answers(eng)
            accs[aq] = float(np.mean([
                score_item(it, ans) for it, ans in zip(rep_items, a)
            ]))
            if not aq:
                # greedy token drafts from the weight-only engine, for the
                # act-quant twin's verify agreement below
                drafts8 = []
                n_ag = min(32, len(rep_items))
                for i in range(0, n_ag, B):
                    toks = [tok_fn(it["prompt"])
                            for it in rep_items[i : i + B]]
                    drafts8 += [
                        [int(x) for x in o.token_ids] or [1]
                        for o in eng.generate(toks, max_new=max_new)
                    ]
            else:
                fr = []
                n_ag = len(drafts8)
                for i in range(0, n_ag, B):
                    chunk = rep_items[i : i + B]
                    toks = [tok_fn(it["prompt"]) for it in chunk]
                    vouts = eng.verify_continue(
                        toks, drafts8[i : i + B], max_new=max_new
                    )
                    fr += [n_acc / max(len(dd), 1)
                           for (_, n_acc), dd in zip(vouts, drafts8[i : i + B])]
                agree = float(np.mean(fr))
            del eng
        row["accuracy_weight_only"] = round(accs[False], 4)
        row["accuracy_act_quant"] = round(accs[True], 4)
        row["answer_preservation"] = round(
            accs[True] / max(accs[False], 1e-9), 4)
        row["token_agreement"] = round(agree, 4) if agree is not None else None
        report["tiers"].append(row)
        print(f"[actquant +{time.time()-t0:5.1f}s] tier {k}: "
              f"wo {accs[False]:.3f} aq {accs[True]:.3f} "
              f"agree {agree:.3f}", file=sys.stderr, flush=True)

    report["wall_s"] = round(time.time() - t0, 1)
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
