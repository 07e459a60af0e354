"""Tests for utils: timing, logging, validation, taxonomy, cost profiler."""

import json
import logging
import time

import numpy as np
import pytest

from adaptive_sd_tpu.core.exceptions import DeadlineError, ValidationError
from adaptive_sd_tpu.core.types import TaskComplexity, TaskDomain
from adaptive_sd_tpu.utils import (
    CostProfiler,
    Deadline,
    MeasurementConfig,
    NumericValidator,
    PerformanceProfiler,
    RateLimiter,
    StringValidator,
    StructuredFormatter,
    TaskClassifier,
    Timer,
    timed,
    validate_config,
    validate_prompt,
)


class TestTimer:
    def test_measures(self):
        with Timer("t") as t:
            time.sleep(0.01)
        assert 0.005 < t.elapsed_s < 0.5

    def test_sync_called(self):
        calls = []
        with Timer(sync=lambda: calls.append(1)):
            pass
        assert len(calls) == 2  # before and after


class TestProfiler:
    def test_stats_percentiles(self):
        p = PerformanceProfiler()
        for i in range(100):
            p.record("op", i / 1000)
        s = p.stats("op")
        assert s["count"] == 100
        assert s["p95_s"] >= s["p50_s"] >= s["min_s"]
        assert p.stats("missing") == {"count": 0}

    def test_timed_decorator(self):
        prof = PerformanceProfiler()

        @timed(prof, "myop")
        def f():
            return 42

        assert f() == 42
        assert prof.stats("myop")["count"] == 1


class TestRateLimiter:
    def test_burst_then_block(self):
        rl = RateLimiter(rate_per_s=1000.0, burst=2)
        assert rl.try_acquire() and rl.try_acquire()
        assert not rl.try_acquire()  # bucket empty
        time.sleep(0.005)
        assert rl.try_acquire()  # refilled

    def test_acquire_timeout(self):
        rl = RateLimiter(rate_per_s=0.5, burst=1)
        rl.try_acquire()
        assert not rl.acquire(timeout_s=0.05)


class TestDeadline:
    def test_expiry(self):
        d = Deadline(0.01)
        assert not d.expired
        time.sleep(0.02)
        assert d.expired
        with pytest.raises(DeadlineError):
            d.check()


class TestLogging:
    def test_structured_formatter_json(self):
        rec = logging.LogRecord("n", logging.INFO, "f", 1, "hello %s", ("x",), None)
        rec.custom_field = 7
        out = json.loads(StructuredFormatter().format(rec))
        assert out["message"] == "hello x" and out["custom_field"] == 7


class TestValidators:
    def test_string_chain(self):
        v = StringValidator("name").non_empty().max_length(5)
        assert v.validate("abc") == "abc"
        with pytest.raises(ValidationError):
            v.validate("toolong")
        with pytest.raises(ValidationError):
            v.validate(123)

    def test_numeric_chain(self):
        v = NumericValidator().in_range(0, 10).integer()
        assert v.validate(5) == 5
        with pytest.raises(ValidationError):
            v.validate(11)
        with pytest.raises(ValidationError):
            v.validate(2.5)

    def test_prompt_injection_screen(self):
        assert validate_prompt("What is 2+2?")
        with pytest.raises(ValidationError):
            validate_prompt("<script>alert(1)</script>")
        with pytest.raises(ValidationError):
            validate_prompt("bad\x00byte")

    def test_config_schema_walker(self):
        schema = {
            "server": {"port": {"type": int, "range": (1, 65535), "required": True}},
            "mode": {"type": str, "choices": ["a", "b"]},
        }
        validate_config({"server": {"port": 8000}, "mode": "a"}, schema)
        with pytest.raises(ValidationError):
            validate_config({"server": {"port": 0}}, schema)
        with pytest.raises(ValidationError):
            validate_config({"server": {}, "mode": "c"}, schema)


class TestTaxonomy:
    def test_code_domain(self):
        c = TaskClassifier().classify("Write a python function to sort a list")
        assert c.domain in (TaskDomain.CODE, TaskDomain.CREATIVE)

    def test_math_domain(self):
        c = TaskClassifier().classify("Solve the equation 3*x + 4 = 19")
        assert c.domain == TaskDomain.MATH
        assert c.requires_precision

    def test_complexity_ordering(self):
        easy = TaskClassifier().classify("Name the capital of France, briefly")
        hard = TaskClassifier().classify(
            "Formally prove the optimal multi-step tradeoff between distributed "
            "consensus latency and concurrent throughput under constraints " * 3
        )
        assert hard.complexity.value > easy.complexity.value

    def test_recommendation_monotone(self):
        tc = TaskClassifier()
        easy = tc.classify("Name a color")
        hard = tc.classify("Rigorously prove and analyze the optimal distributed algorithm " * 5)
        assert tc.recommend_stage(hard) >= tc.recommend_stage(easy)

    def test_analytical_domain(self):
        c = TaskClassifier().classify(
            "Analyze the time series data for seasonal trends and report the "
            "correlation between the two metrics"
        )
        assert c.domain == TaskDomain.ANALYTICAL

    def test_detailed_attributes(self):
        c = TaskClassifier().classify(
            "Implement a python function that must run in O(n log n); first "
            "sort the list, then merge; include an example and iterate to "
            "optimize it"
        )
        assert c.requires_code_generation
        assert c.has_constraints
        assert c.requires_examples
        assert c.benefits_from_iteration
        assert c.estimated_steps >= 2

    def test_cognitive_load_argmax_prefers_higher_bloom(self):
        c = TaskClassifier().classify(
            "Evaluate and critique which design is better and recommend one"
        )
        from adaptive_sd_tpu.core.types import CognitiveLoad

        assert c.cognitive_load == CognitiveLoad.EVALUATION

    def test_recommend_scores_normalised(self):
        tc = TaskClassifier()
        scores = tc.recommend_scores(tc.classify("Summarize this paragraph"), n_stages=4)
        assert len(scores) == 4
        assert abs(sum(scores) - 1.0) < 1e-9
        assert all(s >= 0 for s in scores)

    def test_batch_and_distribution(self):
        tc = TaskClassifier()
        tasks = tc.batch_classify([
            "What is the capital of Peru?",
            "Write a poem about rain",
            "Solve 12 * 9 = ?",
        ])
        dist = tc.analyze_distribution(tasks)
        assert dist["n"] == 3
        assert sum(dist["domains"].values()) == 3
        assert 0.0 <= dist["precision_fraction"] <= 1.0
        assert tc.analyze_distribution([]) == {"n": 0}

    def test_signals_carry_full_score_vector(self):
        c = TaskClassifier().classify("Compute the integral of x^2")
        assert any(k.startswith("domain_") for k in c.signals)
        assert any(k.startswith("complexity_") for k in c.signals)
        assert any(k.startswith("load_") for k in c.signals)


class TestCostProfiler:
    def test_mock_fit_and_ratios(self):
        cp = CostProfiler(MeasurementConfig(repetitions=1))
        cp.mock_measurements("7b", 1.0)
        cp.mock_measurements("32b", 4.5)
        cp.mock_measurements("72b", 10.0)
        ratios = cp.cost_ratios(["7b", "32b", "72b"])
        assert ratios[0] == pytest.approx(1.0)
        assert 2.0 < ratios[1] < 8.0
        assert 5.0 < ratios[2] < 18.0

    def test_profile_tier_real_callable(self):
        cp = CostProfiler(
            MeasurementConfig(
                input_lens=(8, 16), output_lens=(4, 8), batch_sizes=(1, 2), repetitions=2
            )
        )
        calls = []

        def run(b, i, o):
            calls.append((b, i, o))
            time.sleep(0.0005 * o)

        rows = cp.profile_tier("t", run)
        assert rows and all(r.latency_s > 0 for r in rows)
        m = cp.fit_cost_model("t")
        assert m.r2 > 0.3 and m.per_token_s > 0

    def test_write_back(self, tmp_path):
        cp = CostProfiler(MeasurementConfig(repetitions=1))
        cp.mock_measurements("a", 1.0)
        cp.mock_measurements("b", 4.0)
        path = tmp_path / "cascade.yaml"
        cp.write_back_costs(str(path), ["a", "b"])
        import yaml

        cfg = yaml.safe_load(path.read_text())
        assert cfg["stages"][0]["cost_per_token"] == pytest.approx(1.0)
        assert cfg["stages"][1]["cost_per_token"] > 1.5


class TestMetrics:
    def test_counter_gauge_histogram_export(self):
        from adaptive_sd_tpu.utils.metrics import MetricsCollector

        m = MetricsCollector(namespace="test")
        m.inc("requests_total", help="reqs")
        m.inc("requests_total")
        m.inc("stage_requests_total", labels={"stage": "1"})
        m.set_gauge("lambda_value", 0.5)
        for v in (0.01, 0.2, 3.0):
            m.observe("request_latency_seconds", v)
        text = m.export_metrics("prometheus")
        assert "test_requests_total 2.0" in text
        assert 'test_stage_requests_total{stage="1"} 1.0' in text
        assert "test_lambda_value 0.5" in text
        assert "test_request_latency_seconds_count 3" in text
        assert 'le="+Inf"' in text
        # cumulative bucket counts are monotone
        counts = [int(l.rsplit(" ", 1)[1]) for l in text.splitlines()
                  if l.startswith("test_request_latency_seconds_bucket")]
        assert counts == sorted(counts)

    def test_record_dispatch(self):
        from adaptive_sd_tpu.utils.metrics import MetricsCollector

        m = MetricsCollector()
        m.record("queue_depth", 4)
        m.record("step_latency_s", 0.1)
        text = m.export_metrics()
        assert "queue_depth 4" in text and "step_latency_s_count 1" in text

    def test_snapshot_and_bad_format(self):
        from adaptive_sd_tpu.utils.metrics import MetricsCollector

        m = MetricsCollector()
        m.inc("requests_total", 5)
        m.inc("errors_total", 1)
        snap = m.snapshot()
        assert snap.total_requests == 5 and snap.error_rate == pytest.approx(0.2)
        with pytest.raises(ValueError):
            m.export_metrics("json")
