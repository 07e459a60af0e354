"""Unit tests for the policy layer: DP stopping rule, theory, regret bounds.

Golden values mirror the reference's theory-demo tables (SURVEY.md §3.5) in
behaviour: monotone thresholds, earlier stopping for larger lambda, regret
within the sqrt(T log T) envelope.
"""

import math

import numpy as np
import pytest

from adaptive_sd_tpu.policy import (
    AdaptiveStopping,
    OptimalStoppingTable,
    OptimalStoppingTheory,
    RegretAnalyzer,
    TheoreticalAnalysis,
    TheoreticalParameters,
    bayesian_adjustment,
    compute_expected_cost,
    compute_sample_complexity,
    concentration_inequality,
    derive_regret_bound,
    finite_sample_bound,
    martingale_concentration,
    optimal_stopping_rule,
    optimal_stopping_rule_jnp,
)

COSTS = [1.0, 2.0, 4.5, 10.0]


class TestOptimalStoppingRule:
    def test_high_first_stage_prob_stops_immediately(self):
        k, V = optimal_stopping_rule([0.99, 0.99, 0.99, 0.99], COSTS, lam=1.0)
        assert k == 0
        assert V.shape == (4,)

    def test_low_probs_escalate_to_last(self):
        k, _ = optimal_stopping_rule([0.0, 0.0, 0.0, 1.0], COSTS, lam=0.01)
        assert k == 3

    def test_larger_lambda_stops_earlier(self):
        probs = [0.3, 0.5, 0.7, 0.95]
        ks = [optimal_stopping_rule(probs, COSTS, lam)[0] for lam in (0.01, 0.5, 5.0, 50.0)]
        assert ks == sorted(ks, reverse=True)
        assert ks[0] >= ks[-1]

    def test_huge_lambda_always_stops_at_zero(self):
        k, _ = optimal_stopping_rule([0.1, 0.9, 0.9, 0.9], COSTS, lam=1000.0)
        assert k == 0

    def test_single_stage(self):
        k, V = optimal_stopping_rule([0.5], [1.0], lam=1.0)
        assert k == 0 and V[0] == pytest.approx(0.5)

    def test_validation(self):
        with pytest.raises(ValueError):
            optimal_stopping_rule([], [], 1.0)
        with pytest.raises(ValueError):
            optimal_stopping_rule([1.5], [1.0], 1.0)
        with pytest.raises(ValueError):
            optimal_stopping_rule([0.5], [1.0], -1.0)
        with pytest.raises(ValueError):
            optimal_stopping_rule([0.5, 0.5], [1.0], 1.0)

    def test_jnp_twin_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        for _ in range(50):
            p = rng.uniform(0, 1, size=4)
            lam = float(rng.uniform(0.01, 10.0))
            k_np, _ = optimal_stopping_rule(p, COSTS, lam)
            k_j = int(
                optimal_stopping_rule_jnp(
                    jnp.asarray(p), jnp.asarray(COSTS, dtype=jnp.float32), jnp.float32(lam)
                )
            )
            assert k_np == k_j, (p, lam)

    def test_jnp_twin_jits(self):
        import jax
        import jax.numpy as jnp

        f = jax.jit(optimal_stopping_rule_jnp)
        k = f(jnp.array([0.9, 0.9, 0.9, 0.9]), jnp.asarray(COSTS), jnp.float32(1.0))
        assert int(k) == 0


class TestExpectedCost:
    def test_matches_manual_two_stage(self):
        # p=[0.6, 1.0], C=[1, 3], lam=0.1. Policy: stop at 0? stop=0.4,
        # cont=0.1*2+0=0.2 -> continue; k*=1. E[q]=0.6+0.4*1.0... p[1]=1.0:
        # E[q] = 0.6 + 0.4*1.0 = 1.0; E[paid] = 0.6*1 + 0.4*3 = 1.8.
        val = compute_expected_cost([0.6, 1.0], [1.0, 3.0], 0.1)
        assert val == pytest.approx((1.0 - 1.0) + 0.1 * 1.8)

    def test_stop_at_zero(self):
        val = compute_expected_cost([0.9, 0.95], [1.0, 10.0], 5.0)
        assert val == pytest.approx((1.0 - 0.9) + 5.0 * 1.0)


class TestBayesianAdjustment:
    def test_no_observations_returns_prior_mean(self):
        assert bayesian_adjustment(0.9, 0, alpha=1, beta=1) == pytest.approx(0.5)

    def test_many_observations_returns_estimate(self):
        assert bayesian_adjustment(0.9, 10_000) == pytest.approx(0.9, abs=1e-3)

    def test_shrinkage_is_monotone_in_n(self):
        vals = [bayesian_adjustment(0.9, n) for n in (0, 1, 10, 100, 1000)]
        assert vals == sorted(vals)

    def test_validation(self):
        with pytest.raises(ValueError):
            bayesian_adjustment(1.5, 10)
        with pytest.raises(ValueError):
            bayesian_adjustment(0.5, -1)


class TestStoppingTable:
    def test_precompute_and_lookup(self):
        table = OptimalStoppingTable(costs=COSTS, lambdas=(0.5, 1.0))
        n = table.precompute()
        assert n > 0
        k = table.lookup([1.0, 1.0, 1.0, 1.0], 1.0)
        assert k == 0

    def test_fallback_on_miss(self):
        table = OptimalStoppingTable(costs=COSTS)
        k = table.lookup([0.123, 0.456, 0.789, 0.999], 1.0)
        k_direct, _ = optimal_stopping_rule([0.12, 0.46, 0.79, 1.0], COSTS, 1.0)
        assert isinstance(k, int)
        # cached now
        assert table.lookup([0.123, 0.456, 0.789, 0.999], 1.0) == k


class TestAdaptiveStopping:
    def test_explores_under_min_pulls(self):
        a = AdaptiveStopping(n_stages=4)
        assert a.should_explore(2)

    def test_converges_to_best_arm(self):
        rng = np.random.default_rng(0)
        a = AdaptiveStopping(n_stages=3, lam=0.1, min_pulls=5)
        true_q = [0.5, 0.9, 0.7]
        costs = [1.0, 2.0, 4.5]
        for _ in range(500):
            for s in range(3):
                a.update_statistics(s, float(rng.random() < true_q[s]), costs[s] * 0.01)
        assert a.best_stage() == 1
        assert not a.should_explore(0) or a.counts[0] < 5


class TestTheory:
    def test_thresholds_monotone_in_lambda(self):
        th = OptimalStoppingTheory()
        t_small = th.derive_optimal_policy(0.1)
        t_big = th.derive_optimal_policy(5.0)
        # larger lambda -> lower thresholds -> easier to stop early
        assert np.all(t_big <= t_small + 1e-12)
        assert t_small[-1] == 0.0  # last stage always stops

    def test_threshold_shapes(self):
        params = TheoreticalParameters()
        th = OptimalStoppingTheory(params)
        t = th.derive_optimal_policy(1.0)
        assert t.shape == (params.n_stages,)
        assert np.all((t >= 0) & (t <= 1))

    def test_regret_bound_grows_sublinearly(self):
        th = OptimalStoppingTheory()
        r1, r2 = th.compute_regret_bound(1000), th.compute_regret_bound(4000)
        assert r2 < 4 * r1  # sublinear: quadrupling T less than quadruples bound
        assert th.compute_regret_bound(0) == 0.0

    def test_sample_complexity(self):
        th = OptimalStoppingTheory()
        m = th.sample_complexity(0.05, 0.05)
        assert m == math.ceil(math.log(2 * 4 / 0.05) / (2 * 0.05**2))
        with pytest.raises(ValueError):
            th.sample_complexity(0.0)

    def test_improvement_probability(self):
        th = OptimalStoppingTheory()
        assert th.improvement_probability(1.0) == 0.0
        assert th.improvement_probability(0.0) == pytest.approx(0.6)

    def test_proof_text(self):
        assert "theorem" in OptimalStoppingTheory().prove_optimality().lower()

    def test_params_validation(self):
        with pytest.raises(ValueError):
            TheoreticalParameters(quality_bounds=(0.7, 0.8), cost_ratios=(1.0,))
        with pytest.raises(ValueError):
            TheoreticalParameters(cost_ratios=(10.0, 4.5, 2.0, 1.0))


class TestRegretAnalyzer:
    def test_oracle_regret_zero(self):
        ra = RegretAnalyzer()
        rng = np.random.default_rng(1)
        for _ in range(100):
            d = float(rng.uniform(0, 1))
            assert ra.record_decision(ra.oracle_stage(d), d) == 0.0
        assert ra.cumulative_regret() == 0.0

    def test_bad_policy_has_regret_and_rate_tracks(self):
        ra = RegretAnalyzer(lam=1.0)
        rng = np.random.default_rng(2)
        for _ in range(200):
            d = float(rng.uniform(0, 1))
            ra.record_decision(3, d)  # always use the most expensive stage
        s = ra.summary()
        assert s["cumulative_regret"] > 0
        assert s["decisions"] == 200


class TestRegretBounds:
    def test_bound_kinds(self):
        assert derive_regret_bound(1000, 4) == pytest.approx(math.sqrt(4 * 1000 * math.log(1000)))
        assert derive_regret_bound(1000, 4, kind="minimax") == pytest.approx(math.sqrt(4000))
        hp = derive_regret_bound(1000, 4, kind="high_probability")
        assert hp > derive_regret_bound(1000, 4, kind="minimax")
        pd = derive_regret_bound(1000, 4, gaps=[0.1, 0.2, 0.3], kind="problem_dependent")
        assert pd > 0
        with pytest.raises(ValueError):
            derive_regret_bound(100, 4, kind="nope")
        with pytest.raises(ValueError):
            derive_regret_bound(100, 4, kind="problem_dependent")

    def test_sample_complexities_ordering(self):
        h = compute_sample_complexity(0.05)
        b = compute_sample_complexity(0.05, method="bernstein", variance=0.01)
        assert b < h  # low variance helps Bernstein
        m = compute_sample_complexity(0.05, method="median_of_means")
        assert m > 0

    def test_concentration(self):
        assert concentration_inequality(0, 0.1) == 1.0
        assert concentration_inequality(10_000, 0.1) < 1e-10
        assert concentration_inequality(100, 0.1, kind="bernstein") < 1.0

    def test_martingale(self):
        assert martingale_concentration(100, 20.0, kind="azuma") < 1.0
        assert martingale_concentration(100, 20.0, kind="mcdiarmid") < martingale_concentration(
            100, 20.0, kind="azuma"
        )

    def test_finite_sample(self):
        assert finite_sample_bound(0, 0.1) == float("inf")
        assert finite_sample_bound(10_000, 0.01) < 0.1

    def test_full_analysis_and_empirical(self):
        ta = TheoreticalAnalysis(4)
        rep = ta.full_analysis(10_000)
        assert rep["regret_minimax_lower"] <= rep["regret_problem_independent"]
        emp = ta.empirical_vs_bound(np.full(1000, 0.01))
        assert emp["within_bound"]
