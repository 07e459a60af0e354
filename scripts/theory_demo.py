#!/usr/bin/env python
"""Theory validation demo: thresholds, regret bounds, sample complexity.

Role parity: reference ``experiments/final/simple_theory_demo.py`` +
``experiments/scripts/demonstrate_theory.py`` (threshold tables per lambda,
regret-bound growth, sample-complexity table, empirical-vs-bound check).
Pure CPU, zero model weights — the reference's §3.5 validation path.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from adaptive_sd_tpu.policy import (
    OptimalStoppingTheory,
    RegretAnalyzer,
    TheoreticalAnalysis,
    TheoreticalParameters,
    optimal_stopping_rule,
)


def main() -> None:
    params = TheoreticalParameters()
    theory = OptimalStoppingTheory(params)

    print("=== optimal thresholds theta_s(lambda) ===")
    lambdas = [0.1, 0.5, 1.0, 2.0, 5.0]
    header = "lambda | " + " | ".join(f"s={s}" for s in range(params.n_stages))
    print(header)
    for lam in lambdas:
        th = theory.derive_optimal_policy(lam)
        print(f"{lam:6.1f} | " + " | ".join(f"{t:.3f}" for t in th))

    print("\n=== regret bound growth O(sqrt(T log T)) ===")
    for T in (100, 1_000, 10_000, 100_000):
        b = theory.compute_regret_bound(T)
        print(f"T={T:>7}: bound={b:10.1f}  bound/T={b / T:.4f}")

    print("\n=== sample complexity m(epsilon, delta=0.05) ===")
    for eps in (0.1, 0.05, 0.02, 0.01):
        print(f"eps={eps:0.2f}: m={theory.sample_complexity(eps):>7}")

    print("\n=== empirical regret vs bound ===")
    # The O(sqrt(T log T)) guarantee is for LEARNING policies: the UCB online
    # learner (policy/dp.AdaptiveStopping) exhibits sublinear regret, while a
    # fixed policy with persistent predictor noise has LINEAR regret — both
    # are shown so the bound's scope is explicit.
    from adaptive_sd_tpu.policy import AdaptiveStopping

    rng = np.random.default_rng(0)
    lam = 0.05
    true_quality = np.asarray(params.quality_bounds)
    costs_n = np.asarray(params.cost_ratios) / params.cost_ratios[-1]
    true_reward = true_quality - lam * costs_n
    best = float(true_reward.max())

    learner = AdaptiveStopping(n_stages=params.n_stages, lam=lam, min_pulls=10)
    ucb_regrets = []
    for t in range(5_000):
        candidates = [s for s in range(params.n_stages) if learner.should_explore(s)]
        arm = candidates[t % len(candidates)] if candidates else learner.best_stage()
        quality = float(rng.random() < true_quality[arm])
        learner.update_statistics(arm, quality, float(costs_n[arm]))
        ucb_regrets.append(best - float(true_reward[arm]))
    ucb = TheoreticalAnalysis(params.n_stages).empirical_vs_bound(ucb_regrets)
    print("UCB learner:", json.dumps(ucb))

    analyzer = RegretAnalyzer(params=params, lam=1.0)
    for _ in range(5_000):
        d = float(rng.uniform(0, 1))
        p_hat = np.clip(
            [q - max(d - 0.3, 0) + rng.normal(0, 0.15) for q in params.quality_bounds],
            0, 1,
        )
        k, _ = optimal_stopping_rule(p_hat, list(costs_n), 1.0)
        analyzer.record_decision(k, d)
    fixed = TheoreticalAnalysis(params.n_stages).empirical_vs_bound(analyzer.regrets)
    print("fixed noisy policy:", json.dumps(fixed))
    print("\nUCB within sqrt(T log T) envelope:", ucb["within_bound"],
          "| fixed policy within:", fixed["within_bound"], "(expected False)")


if __name__ == "__main__":
    main()
