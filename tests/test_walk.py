"""CascadeWalk: the vectorized bench walk must match the scalar reference
(the round-4 bench's per-item walk, preserved verbatim as ``run_one``)
item-for-item, and its batched DP must match policy/dp.py."""

import numpy as np
import pytest

from adaptive_sd_tpu.evalx.walk import (
    CascadeWalk,
    dp_kstar_batch,
    pres_sigma,
    simulate,
    sweep,
    sweep_or_fallback,
)
from adaptive_sd_tpu.policy.dp import optimal_stopping_rule


def _random_walk(rng, n=64, K=3, prefetch=True, costs=None):
    step = rng.uniform(0.001, 0.01, K).cumsum()          # increasing tiers
    prefill = rng.uniform(0.01, 0.1, K).cumsum()
    verify = prefill + rng.uniform(0.001, 0.05, K)
    return CascadeWalk(
        step=step, prefill=prefill, verify=verify,
        p_hat=rng.random((n, K)), p0=rng.random((n, K)),
        p_true=rng.random((n, K)), max_new=16,
        skip_threshold=0.25, min_draft_quality=0.3,
        prefetch_threshold=0.6, chain_threshold=0.5,
        prefetch_credit=prefetch, costs=costs,
    )


class TestDPBatch:
    @pytest.mark.parametrize("K", [1, 2, 3, 4])
    def test_matches_scalar_rule(self, K):
        rng = np.random.default_rng(0)
        C = np.sort(rng.uniform(0.1, 10.0, K))
        P = rng.random((200, K))
        for lam in (0.0, 0.3, 1.0, 5.0):
            ks = dp_kstar_batch(P, C, lam)
            for i in range(len(P)):
                k_ref, _ = optimal_stopping_rule(P[i], C, lam)
                assert ks[i] == k_ref, (i, lam)


class TestWalkEquivalence:
    @pytest.mark.parametrize("K", [2, 3, 4])
    @pytest.mark.parametrize("prefetch", [True, False])
    def test_vector_matches_scalar(self, K, prefetch):
        rng = np.random.default_rng(K * 10 + prefetch)
        walk = _random_walk(rng, n=128, K=K, prefetch=prefetch)
        for lam in (0.05, 0.5, 1.0, 3.0):
            stops, ts = walk.run(lam)
            for i in range(walk.n):
                s_ref, t_ref = walk.run_one(i, lam)
                assert stops[i] == s_ref, (i, lam)
                assert ts[i] == pytest.approx(t_ref, rel=1e-12), (i, lam)

    def test_costs_override(self):
        rng = np.random.default_rng(7)
        walk = _random_walk(rng, n=64, K=3, costs=[1.0, 3.0, 9.0])
        assert walk.costs[-1] == pytest.approx(1.0)
        stops, ts = walk.run(0.8)
        for i in range(walk.n):
            s_ref, t_ref = walk.run_one(i, 0.8)
            assert stops[i] == s_ref
            assert ts[i] == pytest.approx(t_ref, rel=1e-12)

    def test_call_signature(self):
        rng = np.random.default_rng(1)
        walk = _random_walk(rng, n=8)
        s, t = walk(3, 1.0)
        assert (s, t) == walk.run_one(3, 1.0)


class TestSweepHelpers:
    def test_simulate_and_sweep(self):
        rng = np.random.default_rng(3)
        walk = _random_walk(rng, n=256, K=3)
        goodness = rng.random((256, 3)) < rng.random((256, 3))
        q_largest = max(float(goodness[:, -1].mean()), 1e-9)
        largest_time = float(walk.stage_plain[-1])
        idx = list(range(256))
        dist, pres, spd = simulate(walk, goodness, q_largest, largest_time,
                                   1.0, idx)
        assert dist.sum() == pytest.approx(1.0)
        assert spd > 0
        best = sweep_or_fallback(walk, goodness, q_largest, largest_time, idx,
                                 gate=0.5)
        assert best is not None and best[1] >= 0.0
        hard = sweep(walk, goodness, q_largest, largest_time, idx, gate=1.5)
        assert hard is None  # impossible gate -> None (fallback not applied)

    def test_agreement_bill(self):
        """Per-stage agreement multiplies quality at the stopped tier."""
        rng = np.random.default_rng(4)
        walk = _random_walk(rng, n=128, K=3)
        goodness = np.ones((128, 3), bool)
        _, pres_full, _ = simulate(walk, goodness, 1.0, 1.0, 1.0,
                                   list(range(128)))
        _, pres_half, _ = simulate(walk, goodness, 1.0, 1.0, 1.0,
                                   list(range(128)), agreement=[0.5, 0.5, 0.5])
        assert pres_half == pytest.approx(pres_full * 0.5)

    def test_pres_sigma_scales_with_n(self):
        rng = np.random.default_rng(5)
        walk = _random_walk(rng, n=512, K=3)
        goodness = rng.random((512, 3)) < 0.7
        s_small = pres_sigma(walk, goodness, 0.7, list(range(128)), 1.0)
        s_large = pres_sigma(walk, goodness, 0.7, list(range(512)), 1.0)
        assert s_large < s_small  # ~1/sqrt(n)
