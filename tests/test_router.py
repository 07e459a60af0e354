"""Cross-host serving plane: ReplicaRouter over cascade replicas.

Production topology (cascade/router.py): one cascade replica per host slice,
DCN carries only requests — here replicas live on disjoint CPU sub-meshes of
the 8-device virtual mesh (conftest), standing in for per-host ICI domains.
"""

import threading
import time

import jax
import jax.numpy as jnp
import pytest

from adaptive_sd_tpu.cascade import (
    AdaptiveCascadePipeline,
    EngineTextStage,
    MockStage,
    PipelineConfig,
    ReplicaRouter,
    ScheduledCascadePipeline,
    StageManager,
    build_replica_set,
)
from adaptive_sd_tpu.core.exceptions import OptimizationError
from adaptive_sd_tpu.core.types import PredictionResult, RequestContext
from adaptive_sd_tpu.engine import TierEngine
from adaptive_sd_tpu.models import TINY, init_params

PAGE = 16


class FixedPredictor:
    def __init__(self, q=0.95):
        self.q = q

    def predict(self, prompt, draft, logprobs, stage):
        return PredictionResult(quality_score=self.q)


def _mock_pipeline(tag: str) -> AdaptiveCascadePipeline:
    stages = StageManager([
        MockStage(name=f"{tag}-s0", cost_per_token=1.0),
        MockStage(name=f"{tag}-s1", cost_per_token=4.0),
    ])
    return AdaptiveCascadePipeline(
        stages, FixedPredictor(), PipelineConfig(enable_caching=False)
    )


class FailingPipeline:
    """process_request raises — exercises failover + health ejection."""

    def __init__(self):
        self.calls = 0
        self.stages = StageManager([MockStage(name="dead")])
        self.costs = [1.0]

    def process_request(self, request, **kw):
        self.calls += 1
        raise RuntimeError("replica down")

    def get_stats(self):
        return {"total_requests": 0}

    def update_lambda(self, lam):
        pass

    def reset_stats(self):
        pass

    def shutdown(self):
        pass


class TestRouterLogic:
    def test_routes_and_aggregates(self):
        router = ReplicaRouter([_mock_pipeline("a"), _mock_pipeline("b")])
        for i in range(6):
            res = router.process_request(RequestContext(prompt=f"q {i}"))
            assert res.error is None
        stats = router.get_stats()
        assert stats["total_requests"] == 6
        assert stats["replicas"] == 2
        # least-loaded alternation: both replicas served requests
        per = [s["total_requests"] for s in stats["per_replica"]]
        assert all(p > 0 for p in per) and sum(per) == 6

    def test_failover_and_ejection(self):
        dead = FailingPipeline()
        live = _mock_pipeline("live")
        router = ReplicaRouter([dead, live], probe_interval_s=30.0)
        for i in range(6):
            res = router.process_request(RequestContext(prompt=f"q {i}"))
            assert res.error is None  # always served by the live replica
        # dead replica got ejected after consecutive failures and stops
        # receiving traffic
        assert dead.calls == 3
        assert router.get_stats()["healthy_replicas"] == 1

    def test_ejected_replica_reprobed_after_cooldown(self):
        dead = FailingPipeline()
        live = _mock_pipeline("live")
        router = ReplicaRouter([dead, live], probe_interval_s=0.05)
        for i in range(4):
            router.process_request(RequestContext(prompt=f"q {i}"))
        assert router.get_stats()["healthy_replicas"] == 1
        time.sleep(0.06)
        router.process_request(RequestContext(prompt="probe"))
        assert dead.calls > 3  # re-admitted and probed again

    def test_all_dead_raises(self):
        router = ReplicaRouter([FailingPipeline(), FailingPipeline()])
        with pytest.raises(OptimizationError):
            router.process_request(RequestContext(prompt="x"))

    def test_batch_preserves_order_across_replicas(self):
        router = ReplicaRouter([_mock_pipeline("a"), _mock_pipeline("b")])
        reqs = [RequestContext(prompt=f"item {i}", request_id=f"r{i}") for i in range(7)]
        results = router.batch_process(reqs)
        assert [r.request_id for r in results] == [f"r{i}" for i in range(7)]

    def test_update_lambda_fans_out(self):
        pipes = [_mock_pipeline("a"), _mock_pipeline("b")]
        router = ReplicaRouter(pipes)
        router.update_lambda(2.5)
        for p in pipes:
            assert p.get_stats()["lambda"] == 2.5

    def test_concurrent_load_balances(self):
        router = ReplicaRouter([_mock_pipeline("a"), _mock_pipeline("b")])
        errors = []

        def worker(i):
            try:
                res = router.process_request(RequestContext(prompt=f"load {i}"))
                assert res.error is None
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        per = [s["total_requests"] for s in router.get_stats()["per_replica"]]
        assert sum(per) == 16 and min(per) >= 4  # neither replica starved


def _tok(text):
    return [(ord(c) % (TINY.vocab_size - 1)) + 1 for c in text[:48]] or [1]


def _detok(ids):
    return " ".join(str(int(i)) for i in ids)


class TestDisjointSliceReplicas:
    """Engine-backed replicas on disjoint device slices of the virtual mesh
    (per-host ICI domains in production; DCN never carries tensors)."""

    def _make_pipeline(self, replica_index, devices):
        from jax.sharding import Mesh
        import numpy as np

        from adaptive_sd_tpu.parallel.mesh import AXIS_DP, AXIS_TP

        mesh = Mesh(
            np.asarray(devices).reshape(1, len(devices)), (AXIS_DP, AXIS_TP)
        )
        stages = []
        for i, (name, cost) in enumerate([("small", 1.0), ("large", 4.0)]):
            params = init_params(TINY, jax.random.key(i + 1), dtype=jnp.float32)
            eng = TierEngine(
                TINY, params, page_size=PAGE, n_pages=128,
                use_pallas=False, mesh=mesh,
            )
            stages.append(EngineTextStage(
                eng, _tok, _detok, name=f"r{replica_index}-{name}",
                cost_per_token=cost,
            ))
        return ScheduledCascadePipeline(
            StageManager(stages), FixedPredictor(0.95),
            PipelineConfig(lam=1.0, enable_caching=False),
        )

    def test_replicas_on_disjoint_slices_serve_identically(self):
        devs = jax.devices()
        assert len(devs) >= 8, "conftest should provide the 8-device mesh"
        router = build_replica_set(self._make_pipeline, 2, devices=devs[:8])
        try:
            # greedy decoding: ANY replica must produce the single-pipeline
            # output — replicas are exact copies on different device slices
            solo = self._make_pipeline(9, devs[:4])
            try:
                want = solo.process_request(
                    RequestContext(prompt="route me", max_tokens=8), timeout=120
                ).text
            finally:
                solo.shutdown()
            texts = set()
            for i in range(4):
                res = router.process_request(
                    RequestContext(prompt="route me", request_id=f"rr{i}",
                                   max_tokens=8),
                    timeout=120,
                )
                assert res.error is None
                texts.add(res.text)
            assert texts == {want}
            per = [s["total_requests"] for s in router.get_stats()["per_replica"]]
            assert sum(per) == 4 and all(p > 0 for p in per)
        finally:
            router.shutdown()
