"""Tests for evaluation: baselines, quality metrics, statistics, sweep."""

import numpy as np
import pytest

from adaptive_sd_tpu.evalx import (
    CascadeBaseline,
    ComprehensiveQualityEvaluator,
    FixedStageBaseline,
    OracleBaseline,
    RandomBaseline,
    RigorousEvaluator,
    ThresholdBaseline,
    bleu,
    default_baseline_suite,
    evaluate_baselines,
    generate_publication_table,
    math_accuracy,
    rouge_l,
    rouge_n,
    synthetic_dataset,
    soft_token_f1,
    token_f1,
)


class TestBaselines:
    def test_oracle_beats_random_on_quality(self):
        reports = evaluate_baselines([OracleBaseline(), RandomBaseline()], n_samples=1000)
        oracle, random_ = reports
        assert oracle.avg_quality > random_.avg_quality
        # oracle never overshoots past the cheapest sufficient stage, so it is
        # cheaper than always-largest
        assert oracle.avg_cost < 10.0

    def test_fixed_stage_distribution_is_degenerate(self):
        r = evaluate_baselines([FixedStageBaseline(stage=2)], n_samples=100)[0]
        assert r.stage_distribution[2] == 1.0
        assert r.avg_cost == pytest.approx(4.5)

    def test_fixed_largest_speedup_is_one(self):
        r = evaluate_baselines([FixedStageBaseline(stage=3)], n_samples=100)[0]
        assert r.speedup_vs_largest == pytest.approx(1.0)

    def test_threshold_lower_theta_stops_earlier(self):
        lo = evaluate_baselines([ThresholdBaseline(theta=0.5)], n_samples=500)[0]
        hi = evaluate_baselines([ThresholdBaseline(theta=0.95)], n_samples=500)[0]
        assert lo.avg_stage <= hi.avg_stage

    def test_default_suite_runs(self):
        reports = evaluate_baselines(default_baseline_suite(), n_samples=200)
        assert len(reports) == 8  # oracle, random, 4 fixed, threshold, cascade
        for r in reports:
            assert abs(sum(r.stage_distribution) - 1.0) < 1e-9


class TestQualityMetrics:
    def test_bleu_identity_and_orthogonal(self):
        assert bleu("the cat sat on the mat today ok", "the cat sat on the mat today ok") > 0.95
        assert bleu("alpha beta gamma", "one two three") == 0.0

    def test_rouge(self):
        assert rouge_n("a b c d", "a b c d", 2) == pytest.approx(1.0)
        assert rouge_n("a b", "c d", 1) == 0.0
        assert rouge_l("a x b y c", "a b c") > 0.5

    def test_token_f1(self):
        assert token_f1("paris is the capital", "the capital is paris") == pytest.approx(1.0)

    def test_soft_token_f1_orders_by_similarity(self):
        # identical -> 1; morphological variants beat unrelated; stable
        # across calls (hash is crc32, not process-seeded str hash)
        assert soft_token_f1("running fast", "running fast") == pytest.approx(1.0)
        morpho = soft_token_f1("he was running quickly", "she runs quick")
        unrelated = soft_token_f1("he was running quickly", "tariff policy debate")
        exact = token_f1("he was running quickly", "she runs quick")
        assert morpho > unrelated
        assert morpho > exact  # soft matching credits subword overlap
        assert soft_token_f1("running fast", "") == 0.0
        assert soft_token_f1("a b", "a b") == soft_token_f1("a b", "a b")

    def test_evaluator_reports_soft_f1_as_bertscore(self):
        m = ComprehensiveQualityEvaluator().evaluate(
            "the capitals of europe", "capital cities in europe")
        assert m.bertscore_f1 == pytest.approx(m.details["soft_token_f1"])
        assert m.details["soft_token_f1"] >= m.details["token_f1"]

    def test_math_accuracy_final_answer(self):
        assert math_accuracy("the answer is 42", "42") == 1.0
        assert math_accuracy("the answer is 41", "42") == 0.0
        assert math_accuracy("first 7 then 42", "compute: 42") == 1.0

    def test_evaluator_aggregate_weighting(self):
        ev = ComprehensiveQualityEvaluator()
        m = ev.evaluate("Paris is the capital of France", "Paris", task="factual")
        assert m.task_specific == 1.0  # entity recall
        assert 0 < m.aggregate <= 1
        m2 = ev.evaluate("I do not know", "Paris", task="factual")
        assert m2.aggregate < m.aggregate

    def test_reference_free(self):
        ev = ComprehensiveQualityEvaluator()
        m = ev.evaluate("Step 1: first we analyze. Therefore the result follows.",
                        None, task="reasoning")
        assert m.aggregate > 0.3


class TestStatistics:
    def test_paired_t_detects_difference(self):
        rng = np.random.default_rng(0)
        a = rng.normal(1.0, 0.1, 50)
        b = a - 0.5 + rng.normal(0, 0.05, 50)
        r = RigorousEvaluator().paired_t_test(a, b)
        assert r.significant and r.p_value < 1e-6
        assert r.effect_size > 2
        assert r.ci_low < 0.5 < r.ci_high + 1.0
        assert r.power > 0.99

    def test_paired_t_null(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, 40)
        b = a + rng.normal(0, 0.01, 40)
        r = RigorousEvaluator().paired_t_test(a, b)
        assert abs(r.effect_size) < 1

    def test_bonferroni_and_holm(self):
        ev = RigorousEvaluator()
        ps = [0.01, 0.02, 0.4]
        bonf = ev.bonferroni_correction(ps)
        holm = ev.holm_correction(ps)
        assert bonf[0]["p_adjusted"] == pytest.approx(0.03)
        assert not bonf[2]["significant"]
        # Holm is uniformly no more conservative than Bonferroni
        for h, b in zip(holm, bonf):
            assert h["p_adjusted"] <= b["p_adjusted"] + 1e-12

    def test_bootstrap_ci_covers_mean(self):
        rng = np.random.default_rng(2)
        data = rng.normal(5.0, 1.0, 200)
        stat, lo, hi = RigorousEvaluator().bootstrap_confidence_interval(data)
        assert lo < 5.0 < hi
        assert stat == pytest.approx(data.mean())

    def test_assumption_checks(self):
        rng = np.random.default_rng(3)
        r = RigorousEvaluator().check_assumptions(rng.normal(0, 1, 100))
        assert r["normal"] is True
        r2 = RigorousEvaluator().check_assumptions(rng.exponential(1, 500) ** 3)
        assert r2["normal"] is False

    def test_cv_comparison(self):
        rng = np.random.default_rng(4)
        a = rng.normal(0.8, 0.05, 100)
        b = rng.normal(0.6, 0.05, 100)
        out = RigorousEvaluator().cross_validated_comparison(a, b, k=5)
        assert out["test"].significant

    def test_publication_table(self):
        tex = generate_publication_table(
            [
                {"method": "adaptive", "mean": 0.81, "ci_low": 0.79, "ci_high": 0.83,
                 "p_value": 0.0001, "effect_size": 1.5},
                {"method": "fixed-72b", "mean": 0.84, "ci_low": 0.82, "ci_high": 0.86,
                 "p_value": None, "effect_size": None},
            ]
        )
        assert r"\begin{table}" in tex and "adaptive" in tex and "$<$0.001" in tex


class TestSweep:
    def test_synthetic_datasets(self):
        for name in ("mmlu-style", "gsm8k-style", "humaneval-style", "longform-style"):
            samples = synthetic_dataset(name, 10)
            assert len(samples) == 10 and all(s.prompt for s in samples)
        with pytest.raises(ValueError):
            synthetic_dataset("nope")

    def test_harness_end_to_end(self):
        from adaptive_sd_tpu.cascade import (
            AdaptiveCascadePipeline,
            MockStage,
            PipelineConfig,
            StageManager,
        )
        from adaptive_sd_tpu.evalx import LambdaSweepHarness
        from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic

        X, y, _ = generate_synthetic(n_prompts=150, seed=0)
        pred = MLPQualityPredictor()
        pred.fit(X, y, epochs=8, patience=3)
        pipe = AdaptiveCascadePipeline(
            StageManager(
                [
                    MockStage("small", cost_per_token=1.0, capacity=0.5),
                    MockStage("large", cost_per_token=10.0, capacity=0.97),
                ]
            ),
            pred,
            PipelineConfig(enable_caching=False),
        )
        h = LambdaSweepHarness(pipe)
        points = h.run(lambdas=(0.1, 5.0), datasets=("mmlu-style",), n_per_dataset=8)
        assert len(points) == 2
        summary = h.summary()
        assert set(summary) == {0.1, 5.0}
        # higher lambda must not cost more
        assert summary[5.0]["avg_cost"] <= summary[0.1]["avg_cost"] + 1e-9


class TestFrozenDatasets:
    """Vendored offline suites with objective scoring (VERDICT r1 #3)."""

    def test_all_suites_load(self):
        from adaptive_sd_tpu.evalx import load_samples

        for name, min_n in [("factual-qa", 100), ("gsm-style", 200),
                            ("humaneval-style", 50)]:
            ss = load_samples(name)
            assert len(ss) >= min_n
            assert all(s.prompt and s.reference for s in ss)

    def test_perfect_answers_score_one(self):
        from adaptive_sd_tpu.evalx import evaluate_answers, load_frozen

        for name in ("factual-qa", "gsm-style", "humaneval-style"):
            items = load_frozen(name)
            r = evaluate_answers(name, [str(it["answer"]) for it in items])
            assert r["accuracy"] == 1.0, (name, r["accuracy"])

    def test_wrong_answers_score_low(self):
        from adaptive_sd_tpu.evalx import evaluate_answers, load_frozen

        items = load_frozen("gsm-style")
        r = evaluate_answers("gsm-style", ["the answer is 987654321"] * len(items))
        assert r["accuracy"] == 0.0
        items = load_frozen("humaneval-style")
        r = evaluate_answers("humaneval-style",
                             ["def nope():\n    return None"] * len(items))
        assert r["accuracy"] == 0.0

    def test_code_scorer_runs_real_tests(self):
        from adaptive_sd_tpu.evalx import load_frozen, score_item

        item = next(it for it in load_frozen("humaneval-style")
                    if it["entry"] == "is_balanced")
        good = "def is_balanced(s):\n    d = 0\n    for c in s:\n        d += c == '('\n        d -= c == ')'\n        if d < 0:\n            return False\n    return d == 0"
        assert score_item(item, f"```python\n{good}\n```") == 1.0
        subtly_wrong = "def is_balanced(s):\n    return s.count('(') == s.count(')')"
        assert score_item(item, subtly_wrong) < 1.0

    def test_deterministic_regeneration(self, tmp_path):
        """The committed JSONs are reproducible from the generator."""
        import json
        import pathlib
        import subprocess
        import sys

        from adaptive_sd_tpu.evalx.datasets import DATA_DIR

        import scripts.build_datasets as bd

        assert bd.build_gsm()[:3] == bd.build_gsm()[:3]
        with open(pathlib.Path(DATA_DIR) / "gsm_style.json") as f:
            frozen = json.load(f)
        assert bd.build_gsm() == frozen


class TestAdversarialScoring:
    """Scorer hardening (VERDICT r2 missing #6): the failure modes a real
    model's prose produces — wrong-letter-in-prose, multiple numbers,
    negations, side-effectful code — must not fool the objective scorers."""

    def _choice_item(self):
        return {"task": "factual", "answer": "B",
                "options": ["Sydney", "Canberra", "Melbourne", "Perth"]}

    def test_choice_declaration_beats_earlier_letters(self):
        from adaptive_sd_tpu.evalx.datasets import score_choice

        it = self._choice_item()
        assert score_choice("A is tempting, but the answer is B", it) == 1.0
        assert score_choice("B looks right at first; the answer is A", it) == 0.0

    def test_choice_negation_skipped(self):
        from adaptive_sd_tpu.evalx.datasets import score_choice

        it = self._choice_item()
        assert score_choice("not A. B", it) == 1.0
        assert score_choice("It is not B", it) == 0.0

    def test_choice_last_letter_wins_without_declaration(self):
        from adaptive_sd_tpu.evalx.datasets import score_choice

        it = self._choice_item()
        assert score_choice("Could be A or C... no: B", it) == 1.0
        assert score_choice("(B)", it) == 1.0
        assert score_choice("B) Canberra", it) == 1.0

    def test_choice_ambiguous_option_text_scores_zero(self):
        from adaptive_sd_tpu.evalx.datasets import score_choice

        it = self._choice_item()
        # two option texts restated, no letter claim: ambiguous -> 0
        assert score_choice("Sydney and Canberra are both large", it) == 0.0
        # unique correct text -> 1
        assert score_choice("the capital is canberra", it) == 1.0
        # unique WRONG text -> 0
        assert score_choice("the capital is sydney", it) == 0.0
        # letters inside words must not count
        assert score_choice("CAnBerra area", it) == 1.0

    def test_math_declaration_beats_trailing_numbers(self):
        from adaptive_sd_tpu.evalx.datasets import score_math

        assert score_math("The answer is 42 (definitely not 41)", "42") == 1.0
        assert score_math("6 * 7 = 42. So the answer is 42.", "42") == 1.0
        assert score_math("Step 1: 40. Step 2: add 2 -> 42", "42") == 1.0
        assert score_math("The answer is 41; 42 was a red herring", "42") == 0.0
        assert score_math("answer: 1,234", "1234") == 1.0
        assert score_math("no numbers here", "42") == 0.0

    def test_code_infinite_loop_times_out(self):
        from adaptive_sd_tpu.evalx.datasets import _run_code_tests

        rate = _run_code_tests(
            "def f(x):\n    while True:\n        pass",
            ["assert f(1) == 1"], "f", timeout_s=3.0,
        )
        assert rate == 0.0

    def test_code_cannot_import_or_open(self):
        from adaptive_sd_tpu.evalx.datasets import _run_code_tests

        rate = _run_code_tests(
            "import os\ndef f(x):\n    return x",
            ["assert f(1) == 1"], "f",
        )
        assert rate == 0.0
        rate = _run_code_tests(
            "def f(x):\n    open('/tmp/evil', 'w')\n    return x",
            ["assert f(1) == 1"], "f",
        )
        assert rate == 0.0

    def test_code_partial_credit(self):
        from adaptive_sd_tpu.evalx.datasets import _run_code_tests

        rate = _run_code_tests(
            "def f(x):\n    return abs(x)",
            ["assert f(2) == 2", "assert f(-2) == 2", "assert f(0) == 1"], "f",
        )
        assert abs(rate - 2 / 3) < 1e-9


class TestWorkload:
    def test_marginal_solve_rate_matches_capability(self):
        """By sigmoid symmetry over the uniform difficulty marginal, tier k's
        expected solve rate over the workload ~= its capability bound."""
        import numpy as np

        from adaptive_sd_tpu.evalx import make_workload, tier_capabilities
        from adaptive_sd_tpu.evalx.workload import solve_prob_matrix

        items = make_workload(4000, seed=3)
        caps = tier_capabilities(3)
        p = solve_prob_matrix(items, caps, dispersion=0.05)
        rates = p.mean(axis=0)
        assert np.all(np.abs(rates - caps) < 0.05), (rates, caps)

    def test_difficulty_observable_in_text(self):
        """Harder items are longer — the predictor's feature signal."""
        import numpy as np

        from adaptive_sd_tpu.evalx import make_workload

        items = make_workload(1000, seed=4)
        lens = np.asarray([len(it.prompt) for it in items])
        d = np.asarray([it.difficulty for it in items])
        corr = np.corrcoef(lens, d)[0, 1]
        assert corr > 0.5, corr


class TestOracleBounds:
    """evalx/oracle.py: perfect-knowledge routing bounds over a realized
    goodness matrix (the bench's oracle rows)."""

    def test_cheapest_good_tier_and_futility(self):
        from adaptive_sd_tpu.evalx import oracle_assignments

        g = np.asarray([
            [1, 1, 1],   # tier 0 suffices
            [0, 1, 1],   # cheapest good is tier 1
            [0, 0, 1],   # only the top tier
            [0, 0, 0],   # NOBODY solves it: futility -> tier 0, not tier 2
        ], bool)
        ks = oracle_assignments(g)
        assert ks.tolist() == [0, 1, 2, 0]

    def test_gate_constrained_spends_slack_on_biggest_savers(self):
        from adaptive_sd_tpu.evalx import gate_constrained_assignments

        # 10 items: 8 easy (tier 0 good), 2 only-top-tier good.
        g = np.zeros((10, 3), bool)
        g[:8, :] = True
        g[8:, 2] = True
        t = np.asarray([1.0, 3.0, 10.0])
        q_largest = g[:, -1].mean()          # = 1.0 here
        # gate at 0.85: quality-max assignment gives mean 1.0 -> slack of
        # 1.5 quality units -> exactly 1 demotion affordable (each costs 1)
        ks = gate_constrained_assignments(g, t, 0.85 * q_largest)
        assert (ks[:8] == 0).all()
        assert sorted(ks[8:].tolist()) == [0, 2]  # one demoted, one kept
        # realized quality still clears the gate
        q = g[np.arange(10), ks].mean()
        assert q >= 0.85 * q_largest

    def test_gate_constrained_never_breaks_unattainable_gate(self):
        from adaptive_sd_tpu.evalx import (
            gate_constrained_assignments,
            oracle_assignments,
        )

        g = np.zeros((4, 2), bool)
        g[0, 1] = True
        # gate above the attainable max: keep the quality-max assignment
        ks = gate_constrained_assignments(g, np.asarray([1.0, 4.0]), 0.9)
        assert ks.tolist() == oracle_assignments(g).tolist()

    def test_expected_ceiling_meets_gate_at_min_cost(self):
        """expected_gate_constrained_assignments: the probability-knowledge
        ceiling — Lagrangian assignment on expected per-tier quality, gate on
        the mean. Must (a) meet the gate, (b) beat any fixed-tier assignment
        that also meets it, (c) never beat the aleatoric (realized) ceiling
        in the same world."""
        from adaptive_sd_tpu.evalx import (
            expected_gate_constrained_assignments,
            gate_constrained_assignments,
        )
        from adaptive_sd_tpu.evalx.workload import (
            make_workload,
            realize_goodness,
            solve_prob_matrix,
            tier_capabilities,
        )

        items = make_workload(400, seed=3)
        caps = tier_capabilities(3)
        p = solve_prob_matrix(items, caps, 0.05)
        g = realize_goodness(items, caps, dispersion=0.05, seed=9)
        t = np.asarray([1.0, 4.3, 9.0])
        gate = 0.95 * p[:, -1].mean()
        ks = expected_gate_constrained_assignments(p, t, gate)
        n = len(items)
        assert p[np.arange(n), ks].mean() >= gate - 1e-9
        # beats always-largest (which trivially meets the gate)
        assert t[ks].mean() < t[-1]
        # the realized-goodness ceiling is at least as fast (it knows the
        # coin flips; gate in the same absolute units)
        kr = gate_constrained_assignments(g, t, 0.95 * g[:, -1].mean())
        assert t[kr].mean() <= t[ks].mean() + 1e-9

    def test_expected_ceiling_unattainable_gate_goes_largest(self):
        from adaptive_sd_tpu.evalx import expected_gate_constrained_assignments

        p = np.full((10, 3), 0.3)
        ks = expected_gate_constrained_assignments(
            p, np.asarray([1.0, 2.0, 4.0]), 0.9
        )
        assert (ks == 2).all()

    def test_confidence_shift_calibration(self):
        """confidence_logprob_shift: sign carries the noisy observation; the
        bit's agreement with realized goodness is 1 - flip_prob (the
        reference's measured predictor AUC, BASELINE.md)."""
        from adaptive_sd_tpu.evalx.workload import (
            CONFIDENCE_FLIP_PROB,
            confidence_logprob_shift,
        )

        rng = np.random.default_rng(0)
        g = rng.random((2000, 3)) < 0.5
        sh = confidence_logprob_shift(g, seed=1)
        assert sh.shape == g.shape
        assert set(np.unique(np.abs(sh))) == {2.0}
        agree = ((sh > 0) == g).mean()
        assert abs(agree - (1 - CONFIDENCE_FLIP_PROB)) < 0.02
        # deterministic in the seed (bench reproducibility)
        assert np.array_equal(sh, confidence_logprob_shift(g, seed=1))
        assert not np.array_equal(sh, confidence_logprob_shift(g, seed=2))
