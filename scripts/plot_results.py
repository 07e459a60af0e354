#!/usr/bin/env python
"""Publication-style result figures from sweep / baseline JSON outputs.

Role parity: reference ``experiments/scripts/create_research_graphs.py`` /
``create_final_visualizations.py`` / ``analyze_baseline_comparison.py``.

Inputs (produced by the other scripts):
  results/lambda_sweep.json          (scripts/evaluate.py)
  results/baseline_comparison.json   (scripts/run_baselines.py)
Outputs PNG figures under results/figures/.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_lambda_sweep(sweep_path: str, out_dir: pathlib.Path) -> None:
    points = json.loads(pathlib.Path(sweep_path).read_text())
    if not points:
        return
    for p in points:  # in-process harness uses "lam", server mode "lambda"
        p.setdefault("lambda", p.get("lam"))
    lams = sorted({p["lambda"] for p in points})
    by_lam = {
        l: [p for p in points if p["lambda"] == l] for l in lams
    }
    cost = [np.mean([p["avg_cost"] for p in by_lam[l]]) for l in lams]
    qual = [np.mean([p["avg_quality"] for p in by_lam[l]]) for l in lams]
    lat = [np.mean([p["avg_latency_s"] for p in by_lam[l]]) * 1e3 for l in lams]

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].semilogx(lams, cost, "o-")
    axes[0].set_xlabel("lambda"); axes[0].set_ylabel("avg cost")
    axes[0].set_title("Cost vs lambda")
    axes[1].semilogx(lams, qual, "s-", color="tab:green")
    axes[1].set_xlabel("lambda"); axes[1].set_ylabel("avg quality")
    axes[1].set_title("Quality vs lambda")
    axes[2].plot(cost, qual, "d-", color="tab:red")
    for l, c, q in zip(lams, cost, qual):
        axes[2].annotate(f"{l:g}", (c, q), fontsize=8)
    axes[2].set_xlabel("avg cost"); axes[2].set_ylabel("avg quality")
    axes[2].set_title("Quality/cost frontier")
    fig.tight_layout()
    fig.savefig(out_dir / "lambda_sweep.png", dpi=150)
    print(f"wrote {out_dir / 'lambda_sweep.png'}")


def plot_baselines(baseline_path: str, out_dir: pathlib.Path) -> None:
    payload = json.loads(pathlib.Path(baseline_path).read_text())
    reports = payload["reports"]
    names = [r["name"] for r in reports]
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    x = np.arange(len(names))
    axes[0].bar(x, [r["avg_quality"] for r in reports], color="tab:blue")
    axes[0].set_xticks(x, names, rotation=45, ha="right")
    axes[0].set_ylabel("avg quality"); axes[0].set_title("Quality by policy")
    axes[1].bar(x, [r["speedup_vs_largest"] for r in reports], color="tab:orange")
    axes[1].set_xticks(x, names, rotation=45, ha="right")
    axes[1].set_ylabel("speedup vs fixed-largest")
    axes[1].set_title("Speedup by policy")
    fig.tight_layout()
    fig.savefig(out_dir / "baselines.png", dpi=150)
    print(f"wrote {out_dir / 'baselines.png'}")

    # stacked stage distribution
    n = len(reports[0]["stage_distribution"])
    fig2, ax = plt.subplots(figsize=(8, 4))
    bottom = np.zeros(len(names))
    for s in range(n):
        vals = np.asarray([r["stage_distribution"][s] for r in reports])
        ax.bar(names, vals, bottom=bottom, label=f"stage {s}")
        bottom += vals
    ax.legend(); ax.set_ylabel("fraction"); ax.set_title("Stage distribution")
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right")
    fig2.tight_layout()
    fig2.savefig(out_dir / "stage_distribution.png", dpi=150)
    print(f"wrote {out_dir / 'stage_distribution.png'}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sweep", default="results/lambda_sweep.json")
    ap.add_argument("--baselines", default="results/baseline_comparison.json")
    ap.add_argument("--out", default="results/figures")
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if pathlib.Path(args.sweep).exists():
        plot_lambda_sweep(args.sweep, out)
    else:
        print(f"skip sweep plot ({args.sweep} missing — run scripts/evaluate.py)")
    if pathlib.Path(args.baselines).exists():
        plot_baselines(args.baselines, out)
    else:
        print(f"skip baseline plot ({args.baselines} missing — run scripts/run_baselines.py)")


if __name__ == "__main__":
    main()
