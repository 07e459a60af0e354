"""On-device stopping tests: inline feature parity with the host extractor,
decision parity with the host DP, fused generate_with_policy end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.engine import TierEngine
from adaptive_sd_tpu.models import TINY, init_params
from adaptive_sd_tpu.policy import optimal_stopping_rule
from adaptive_sd_tpu.predict import generate_synthetic
from adaptive_sd_tpu.predict.features import extract_features
from adaptive_sd_tpu.predict.inline import (
    INLINE_DIM,
    INLINE_SLICE,
    inline_decision,
    inline_features_jnp,
    policy_from_predictor,
    train_inline_predictor,
)


class TestInlineFeatures:
    def test_matches_host_extractor(self):
        rng = np.random.default_rng(0)
        T = 24
        for n in (1, 7, 24):
            lps = rng.normal(-1.0, 0.7, size=T).clip(-12, 0).astype(np.float32)
            lps[n:] = 0.0
            host = extract_features("p", "d", lps[:n], 0)[INLINE_SLICE]
            dev = np.asarray(
                inline_features_jnp(jnp.asarray(lps)[None, :], jnp.asarray([n]))
            )[0]
            np.testing.assert_allclose(dev, host, rtol=2e-3, atol=2e-3)

    def test_batch_masking_independent(self):
        rng = np.random.default_rng(1)
        lps = jnp.asarray(rng.normal(-1, 0.5, size=(2, 16)).astype(np.float32))
        lens = jnp.asarray([16, 4])
        f_batch = inline_features_jnp(lps, lens)
        f_single = inline_features_jnp(lps[1:2], lens[1:2])
        np.testing.assert_allclose(np.asarray(f_batch[1]), np.asarray(f_single[0]), rtol=1e-6)


class TestInlineDecision:
    @pytest.fixture(scope="class")
    def policy(self):
        X, y, _ = generate_synthetic(n_prompts=250, seed=0)
        pred = train_inline_predictor(X, y, epochs=15, patience=4)
        return pred, policy_from_predictor(
            pred, costs=[1.0, 2.0, 4.5, 10.0], priors=[0.7, 0.8, 0.85, 0.99], lam=0.5
        )

    def test_matches_host_dp(self, policy):
        pred, pol = policy
        rng = np.random.default_rng(2)
        lps = jnp.asarray(rng.normal(-0.8, 0.5, size=(4, 32)).astype(np.float32))
        lens = jnp.asarray([32, 20, 8, 1])
        escalate, p_hat = inline_decision(pol, lps, lens, stage_index=0)
        costs = np.asarray(pol.costs)
        for b in range(4):
            p_vec = np.asarray(pol.priors).copy()
            p_vec[0] = float(p_hat[b])
            k, _ = optimal_stopping_rule(p_vec, costs, float(pol.lam))
            assert bool(escalate[b]) == (k > 0), (b, float(p_hat[b]), k)

    def test_confident_draft_stops(self, policy):
        pred, pol = policy
        good = jnp.full((1, 32), -0.05)
        bad = jnp.full((1, 32), -6.0)
        esc_good, p_good = inline_decision(pol, good, jnp.asarray([32]), 0)
        esc_bad, p_bad = inline_decision(pol, bad, jnp.asarray([32]), 0)
        assert float(p_good[0]) > float(p_bad[0])
        assert not bool(esc_good[0])
        assert bool(esc_bad[0])

    def test_jits(self, policy):
        _, pol = policy
        f = jax.jit(lambda lp, ln: inline_decision(pol, lp, ln, 0))
        esc, p = f(jnp.zeros((2, 8)), jnp.asarray([8, 8]))
        assert esc.shape == (2,)


class TestFusedGenerateWithPolicy:
    def test_end_to_end(self):
        X, y, _ = generate_synthetic(n_prompts=200, seed=1)
        pred = train_inline_predictor(X, y, epochs=10, patience=3)
        pol = policy_from_predictor(
            pred, costs=[1.0, 4.0], priors=[0.6, 0.99], lam=0.3
        )
        params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
        eng = TierEngine(TINY, params, page_size=16, n_pages=64, use_pallas=False)
        outs, escalate, p_hat = eng.generate_with_policy(
            [[1, 2, 3], [9, 8, 7, 6]], pol, stage_index=0, max_new=6
        )
        assert len(outs) == 2 and escalate.shape == (2,) and p_hat.shape == (2,)
        # tokens identical to the plain fused path
        plain = eng.generate([[1, 2, 3], [9, 8, 7, 6]], max_new=6)
        for a, b in zip(outs, plain):
            assert a.token_ids.tolist() == b.token_ids.tolist()
        assert eng.allocator.stats().active_requests == 0


class TestInlinePolicyInPipeline:
    def _pipeline(self, lam):
        import jax
        import jax.numpy as jnp

        from adaptive_sd_tpu.cascade import (
            AdaptiveCascadePipeline,
            EngineTextStage,
            PipelineConfig,
            StageManager,
        )
        from adaptive_sd_tpu.engine import TierEngine

        X, y, _ = generate_synthetic(n_prompts=150, seed=3)
        inline_pred = train_inline_predictor(X, y, epochs=8, patience=3)
        pol = policy_from_predictor(
            inline_pred, costs=[1.0, 4.0], priors=[0.6, 0.99], lam=lam
        )
        # The inline stage (0) must never reach the host predictor; the
        # last stage IS scored honestly by the host predictor now (no 1.0
        # pin), and prompt-only prior calls (draft == "") are allowed to
        # fail (the pipeline falls back to running means).
        def _stub_predict(self, prompt, draft, logprobs, stage):
            if stage == 0:
                raise AssertionError(
                    "host predictor must not be called on inline stage")
            from adaptive_sd_tpu.core.types import PredictionResult

            return PredictionResult(quality_score=0.9)

        host_pred_stub = type("P", (), {"predict": _stub_predict})()
        stages = []
        for i, name in enumerate(["small", "large"]):
            params = init_params(TINY, jax.random.key(i), dtype=jnp.float32)
            eng = TierEngine(TINY, params, page_size=16, n_pages=256, use_pallas=False)
            stages.append(
                EngineTextStage(
                    eng,
                    lambda t: [(ord(c) % 255) + 1 for c in t[:32]] or [1],
                    lambda ids: " ".join(map(str, ids)),
                    name=name,
                    cost_per_token=[1.0, 4.0][i],
                    inline_policy=pol if i == 0 else None,
                    stage_index=i,
                )
            )
        return AdaptiveCascadePipeline(
            StageManager(stages), host_pred_stub,
            PipelineConfig(lam=lam, enable_caching=False, max_new_tokens=6),
        )

    def test_device_decision_drives_routing(self):
        from adaptive_sd_tpu.core.types import RequestContext

        # enormous lambda: on-device DP must never escalate
        pipe = self._pipeline(lam=50.0)
        res = pipe.process_request(RequestContext(prompt="whatever", max_tokens=6))
        assert res.succeeded, res.error
        assert res.final_stage == 0
        assert "on-device" not in (res.error or "")

        # tiny lambda with a pessimistic-ish prior: escalation happens on
        # low-confidence drafts (random weights -> flat logprobs)
        pipe2 = self._pipeline(lam=0.01)
        res2 = pipe2.process_request(RequestContext(prompt="whatever", max_tokens=6))
        assert res2.succeeded, res2.error
        # decision came from the device flag either way; host stub would raise
        assert res2.final_stage in (0, 1)
