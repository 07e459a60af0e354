"""Minimal adaptive decoder tests (reference src/minimal_adaptive_decoder.py parity)."""

import numpy as np
import pytest

from adaptive_sd_tpu.minimal import MinimalAdaptiveDecoder
from adaptive_sd_tpu.predict import generate_synthetic


class TestMinimalDecoder:
    def test_decode_produces_result(self):
        d = MinimalAdaptiveDecoder(lam=1.0)
        r = d.decode("What is the capital of France?")
        assert 0 <= r.selected_stage < 4
        assert len(r.predictions) >= 1
        assert len(r.thresholds) == 4
        assert r.regret >= 0.0

    def test_set_lambda_rederives_thresholds(self):
        d = MinimalAdaptiveDecoder(lam=0.1)
        t_low = list(d.thresholds)
        d.set_lambda(5.0)
        t_high = list(d.thresholds)
        assert all(h <= l + 1e-12 for h, l in zip(t_high, t_low))

    def test_trained_predictor_improves_routing(self):
        X, y, _ = generate_synthetic(n_prompts=200, seed=0)
        d = MinimalAdaptiveDecoder(lam=1.0)
        d.train_predictor(X, y, epochs=10, patience=3)
        for i in range(30):
            d.decode(f"question {i} " + "word " * (i % 20))
        s = d.summary()
        assert s["decisions"] == 30
        assert abs(sum(s["stage_distribution"]) - 1.0) < 1e-9

    def test_capacity_justification(self):
        d = MinimalAdaptiveDecoder()
        j = d.capacity_justification(10_000)
        assert j["generalization_gap_bound"] < 1.0

    def test_custom_stage_fn(self):
        calls = []

        def stage_fn(prompt, s):
            calls.append(s)
            return f"answer-{s}", np.full(8, -0.1)

        d = MinimalAdaptiveDecoder(stage_fn=stage_fn, lam=1.0)
        r = d.decode("easy question")
        assert r.output.startswith("answer-")
        assert calls  # stage_fn used
