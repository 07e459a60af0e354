"""Continuous batching x cascade integration: draft (verify) lane admission
in the scheduler, and the ScheduledCascadePipeline end-to-end — including
exact output equivalence with the fused AdaptiveCascadePipeline at
temperature 0 (greedy decoding is deterministic, so both execution planes
must produce identical text)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.cascade import (
    AdaptiveCascadePipeline,
    EngineTextStage,
    PipelineConfig,
    ScheduledCascadePipeline,
    StageManager,
)
from adaptive_sd_tpu.core.types import PredictionResult, RequestContext
from adaptive_sd_tpu.engine import TierEngine
from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
from adaptive_sd_tpu.models import TINY, init_params

PAGE = 16


@pytest.fixture(scope="module")
def engine():
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    return TierEngine(TINY, params, page_size=PAGE, n_pages=128, use_pallas=False)


class TestDraftAdmission:
    """engine.verify_admit_sample_batch through the scheduler's draft path."""

    def test_self_draft_fully_accepted(self, engine):
        prompt = [3, 5, 7, 9, 11]
        ref = engine.generate([prompt], max_new=8)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        req = sched.submit(prompt, max_new=8, draft=ref)
        sched.run_until_idle()
        assert req.done and req.error is None
        assert req.n_accepted == 8  # the model always agrees with itself
        assert req.out_tokens == ref

    def test_corrupted_draft_heals_to_greedy(self, engine):
        # Greedy decoding is deterministic: whatever junk the draft carries,
        # the verified + lane-decoded output must equal plain generation.
        prompt = [2, 4, 6, 8]
        ref = engine.generate([prompt], max_new=8)[0].token_ids.tolist()
        bad = list(ref)
        bad[3] = (bad[3] + 1) % (TINY.vocab_size - 1) + 1  # corrupt token 3
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        req = sched.submit(prompt, max_new=8, draft=bad)
        sched.run_until_idle()
        assert req.done and req.error is None
        assert req.n_accepted == 3  # accepted exactly up to the corruption
        assert req.out_tokens == ref

    def test_mixed_plain_and_draft_batch(self, engine):
        p1, p2 = [1, 2, 3], [4, 5, 6, 7]
        ref1 = engine.generate([p1], max_new=6)[0].token_ids.tolist()
        ref2 = engine.generate([p2], max_new=6)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(engine, max_batch=4, max_context=128)
        r1 = sched.submit(p1, max_new=6)               # plain admission
        r2 = sched.submit(p2, max_new=6, draft=ref2)   # draft admission
        sched.run_until_idle()
        assert r1.out_tokens == ref1
        assert r2.out_tokens == ref2
        assert r2.n_accepted == 6

    def test_draft_longer_than_budget_truncated(self, engine):
        prompt = [5, 6, 7]
        ref = engine.generate([prompt], max_new=8)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        req = sched.submit(prompt, max_new=4, draft=ref)  # 8-token draft, budget 4
        sched.run_until_idle()
        assert req.done
        assert req.out_tokens == ref[:4]
        assert len(req.out_tokens) == 4

    def test_sampled_draft_admission_completes(self, engine):
        prompt = [9, 8, 7]
        draft = engine.generate([prompt], max_new=6)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        req = sched.submit(prompt, max_new=6, temperature=0.8, draft=draft)
        sched.run_until_idle()
        assert req.done and req.error is None
        assert len(req.out_tokens) == 6
        assert 0 <= req.n_accepted <= 6

    def test_pages_freed_after_draft_requests(self, engine):
        free0 = engine.allocator.stats().free_pages
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        draft = engine.generate([[1, 2]], max_new=4)[0].token_ids.tolist()
        for i in range(5):
            sched.submit([1, 2], max_new=4, draft=draft if i % 2 else None)
        sched.run_until_idle()
        assert engine.allocator.stats().free_pages == free0


class TestStochasticDraftAdmission:
    """Exact stochastic rejection rule in lane admissions (draft_q path)."""

    def test_support_collected_on_sampled_lanes(self, engine):
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, spec_topk=8
        )
        req = sched.submit([1, 2, 3], max_new=6, temperature=0.7)
        sched.run_until_idle()
        assert len(req.out_tokens) == 6
        assert len(req.out_topk_ids) == 6 and len(req.out_topk_probs) == 6
        assert np.asarray(req.out_topk_ids[0]).shape == (8,)

    def test_greedy_lanes_skip_support(self, engine):
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, spec_topk=8
        )
        req = sched.submit([1, 2, 3], max_new=4, temperature=0.0)
        sched.run_until_idle()
        assert req.out_topk_ids == []

    def test_self_draft_fully_accepted_under_exact_rule(self, engine):
        # p == q when the draft came from the SAME model at the SAME
        # temperature, so the rejection rule accepts every token with
        # probability min(1, p/q) = 1 — full acceptance, deterministically.
        # This pins the q/p alignment (both under the per-lane-temperature
        # adjusted distribution); any scaling mismatch would reject tokens.
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, spec_topk=8
        )
        d = sched.submit([4, 5, 6], max_new=6, temperature=0.7)
        sched.run_until_idle()
        assert len(d.out_topk_ids) == 6
        dq = (
            np.asarray(d.out_logprobs, np.float32),
            np.stack(d.out_topk_ids),
            np.stack(d.out_topk_probs),
        )
        req = sched.submit(
            [4, 5, 6], max_new=6, temperature=0.7, draft=d.out_tokens, draft_q=dq
        )
        sched.run_until_idle()
        assert req.done and req.error is None
        assert req.n_accepted == 6
        assert req.out_tokens == d.out_tokens
        # support was carried for the accepted tokens too (3+ tier chains)
        assert len(req.out_topk_ids) == len(req.out_tokens)

    def test_mixed_greedy_and_stochastic_drafted_batch(self, engine):
        sched = ContinuousBatchingScheduler(
            engine, max_batch=4, max_context=128, spec_topk=8
        )
        d = sched.submit([7, 8], max_new=4, temperature=0.5)
        sched.run_until_idle()
        dq = (
            np.asarray(d.out_logprobs, np.float32),
            np.stack(d.out_topk_ids),
            np.stack(d.out_topk_probs),
        )
        greedy_ref = engine.generate([[9, 10]], max_new=4)[0].token_ids.tolist()
        r_stoch = sched.submit(
            [7, 8], max_new=4, temperature=0.5, draft=d.out_tokens, draft_q=dq
        )
        r_greedy = sched.submit([9, 10], max_new=4, draft=greedy_ref)
        sched.run_until_idle()
        assert r_stoch.done and r_stoch.n_accepted == 4
        assert r_greedy.done and r_greedy.out_tokens == greedy_ref


class TestDecodeScan:
    """Multi-step fused decode (scan_steps > 1): one dispatch advances every
    lane several tokens; budgets/eos mask emissions on device."""

    def test_scan_matches_single_step_greedy(self, engine):
        prompts = [[1, 2, 3], [4, 5, 6, 7]]
        refs = [
            engine.generate([p], max_new=9)[0].token_ids.tolist() for p in prompts
        ]
        sched = ContinuousBatchingScheduler(
            engine, max_batch=4, max_context=128, scan_steps=4
        )
        rs = [sched.submit(p, max_new=9) for p in prompts]
        sched.run_until_idle()
        for r, ref in zip(rs, refs):
            assert r.out_tokens == ref

    def test_heterogeneous_budgets_in_one_scan(self, engine):
        short_ref = engine.generate([[8, 9]], max_new=3)[0].token_ids.tolist()
        long_ref = engine.generate([[10, 11]], max_new=11)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(
            engine, max_batch=4, max_context=128, scan_steps=5
        )
        r_short = sched.submit([8, 9], max_new=3)
        r_long = sched.submit([10, 11], max_new=11)
        sched.run_until_idle()
        assert r_short.out_tokens == short_ref
        assert len(r_short.out_tokens) == 3
        assert r_long.out_tokens == long_ref
        assert len(r_long.out_tokens) == 11

    def test_scan_with_draft_admission(self, engine):
        prompt = [12, 13, 14]
        ref = engine.generate([prompt], max_new=10)[0].token_ids.tolist()
        bad = list(ref)
        bad[4] = (bad[4] + 1) % (TINY.vocab_size - 1) + 1
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, scan_steps=4
        )
        req = sched.submit(prompt, max_new=10, draft=bad)
        sched.run_until_idle()
        assert req.n_accepted == 4
        assert req.out_tokens == ref

    def test_scan_collects_support(self, engine):
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, spec_topk=8, scan_steps=4
        )
        req = sched.submit([15, 16], max_new=9, temperature=0.6)
        sched.run_until_idle()
        assert len(req.out_tokens) == 9
        assert len(req.out_topk_ids) == 9

    def test_pages_freed_after_scan_requests(self, engine):
        free0 = engine.allocator.stats().free_pages
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, scan_steps=8
        )
        for i in range(5):
            sched.submit([1 + i, 2, 3], max_new=20)
        sched.run_until_idle()
        assert engine.allocator.stats().free_pages == free0


@pytest.fixture(scope="module")
def pc_engine():
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    return TierEngine(
        TINY, params, page_size=PAGE, n_pages=128, use_pallas=False,
        enable_prefix_cache=True,
    )


class TestPrefixCachedScheduler:
    """Prefix-cache-aware lane admissions: uncached-suffix-window prefill,
    page-table stitching, fill publication, ref release."""

    def test_repeat_prompt_reuses_prefix_and_matches(self, engine, pc_engine):
        # engine and pc_engine share weights (same init key): greedy outputs
        # must agree whether or not the prompt prefix came from the cache.
        prompt = [(i % (TINY.vocab_size - 1)) + 1 for i in range(39)]
        ref = engine.generate([prompt], max_new=6)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(pc_engine, max_batch=2, max_context=128)
        r1 = sched.submit(prompt, max_new=6)
        sched.run_until_idle()
        assert r1.out_tokens == ref      # fill path (cold)
        r2 = sched.submit(prompt, max_new=6)
        sched.run_until_idle()
        assert r2.out_tokens == ref      # hit path (windowed prefill)
        assert r2.n_reused >= PAGE
        assert pc_engine.prefix_cache.stats()["hits"] >= 2

    def test_same_batch_shared_prefix_consistent(self, engine, pc_engine):
        # two same-prompt requests admitted in ONE batch: the second sees the
        # first's unwritten fill chunks and must recompute them, not attend
        # to garbage
        prompt = [(i % (TINY.vocab_size - 1)) + 1 for i in range(7, 46)]
        ref = engine.generate([prompt], max_new=6)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(pc_engine, max_batch=4, max_context=128)
        r1 = sched.submit(prompt, max_new=6)
        r2 = sched.submit(prompt, max_new=6)
        sched.run_until_idle()
        assert r1.out_tokens == ref
        assert r2.out_tokens == ref

    def test_drafted_admission_skips_cached_prefix(self, engine, pc_engine):
        prompt = [(i % (TINY.vocab_size - 1)) + 1 for i in range(3, 45)]
        ref = engine.generate([prompt], max_new=6)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(pc_engine, max_batch=2, max_context=128)
        warm = sched.submit(prompt, max_new=6)   # populate the prefix cache
        sched.run_until_idle()
        assert warm.out_tokens == ref
        bad = list(ref)
        bad[2] = (bad[2] + 1) % (TINY.vocab_size - 1) + 1
        req = sched.submit(prompt, max_new=6, draft=bad)
        sched.run_until_idle()
        assert req.n_reused >= PAGE      # verify window skipped the prefix
        assert req.n_accepted == 2
        assert req.out_tokens == ref     # healed to the greedy continuation

    def test_refs_released_after_retirement(self, pc_engine):
        sched = ContinuousBatchingScheduler(pc_engine, max_batch=2, max_context=128)
        for i in range(4):
            sched.submit([(j + i) % 200 + 1 for j in range(40)], max_new=4)
        sched.run_until_idle()
        assert pc_engine.prefix_cache.stats()["held_refs"] == 0


class FixedPredictor:
    """``q``: scalar (every stage) or per-stage sequence. Escalation tests
    must justify the hop with a higher terminal estimate — honest terminal
    semantics (no last-stage 1.0 pin) futility-stop uniformly-low scores."""

    def __init__(self, q):
        self.q = q

    def predict(self, prompt, draft, logprobs, stage):
        q = self.q[stage] if isinstance(self.q, (list, tuple)) else self.q
        return PredictionResult(quality_score=q)


def _tok(text):
    return [(ord(c) % (TINY.vocab_size - 1)) + 1 for c in text[:48]] or [1]


def _detok(ids):
    return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def tiers():
    stages = []
    for i, (name, cost) in enumerate([("small", 1.0), ("large", 4.0)]):
        params = init_params(TINY, jax.random.key(i + 1), dtype=jnp.float32)
        eng = TierEngine(TINY, params, page_size=PAGE, n_pages=256, use_pallas=False)
        stages.append(EngineTextStage(eng, _tok, _detok, name=name, cost_per_token=cost))
    return stages


class TestScheduledCascadePipeline:
    def test_stops_at_tier0_on_confident_prediction(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.95),
            PipelineConfig(lam=1.0, enable_caching=False),
        )
        try:
            res = pipe.process_request(
                RequestContext(prompt="easy one", max_tokens=8), timeout=120
            )
            assert res.succeeded, res.error
            assert res.final_stage == 0
        finally:
            pipe.shutdown()

    def test_escalates_via_draft_lanes(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor([0.4, 0.9]),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        try:
            res = pipe.process_request(
                RequestContext(prompt="hard one", max_tokens=8), timeout=120
            )
            assert res.succeeded, res.error
            assert res.final_stage == 1
            # tier 1 ran as a draft (verify) admission, not a plain re-run
            assert res.stage_results[1].output.finish_reason.startswith(
                "spec_accepted="
            )
        finally:
            pipe.shutdown()

    def test_matches_fused_pipeline_at_temperature0(self, tiers):
        """Both execution planes must produce identical text at temperature 0
        for identical decisions — fused verify_continue and scheduled
        draft-lane admission are two implementations of one contract."""
        prompts = ["alpha beta", "gamma delta epsilon", "zeta"]
        fused = AdaptiveCascadePipeline(
            StageManager(tiers), FixedPredictor([0.4, 0.9]),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        fused_res = [
            fused.process_request(RequestContext(prompt=p, max_tokens=8))
            for p in prompts
        ]
        sched = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor([0.4, 0.9]),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        try:
            sched_res = [
                sched.process_request(RequestContext(prompt=p, max_tokens=8),
                                      timeout=120)
                for p in prompts
            ]
        finally:
            sched.shutdown()
        for f, s in zip(fused_res, sched_res):
            assert f.final_stage == s.final_stage == 1
            assert f.text == s.text

    def test_stochastic_escalation_uses_exact_rule(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor([0.4, 0.9]),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        try:
            res = pipe.process_request(
                RequestContext(prompt="sample me", max_tokens=8, temperature=0.8),
                timeout=120,
            )
            assert res.succeeded, res.error
            assert res.final_stage == 1
            assert res.stage_results[1].output.finish_reason.startswith(
                "spec_accepted="
            )
        finally:
            pipe.shutdown()

    def test_concurrent_submissions_all_complete(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.95),
            PipelineConfig(lam=1.0, enable_caching=False),
            max_batch=2,
        )
        try:
            jobs = [
                pipe.submit(RequestContext(prompt=f"req number {i}", max_tokens=6))
                for i in range(6)
            ]
            for j in jobs:
                assert j.wait(timeout=180)
                assert j.result is not None and j.result.succeeded
            stats = pipe.get_stats()
            assert stats["total_requests"] == 6
            assert stats["schedulers"][0]["completed"] == 6
        finally:
            pipe.shutdown()

    def test_shutdown_fails_inflight_jobs_instead_of_hanging(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.4),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        pipe.start()
        jobs = [
            pipe.submit(RequestContext(prompt=f"inflight {i}", max_tokens=64))
            for i in range(3)
        ]
        pipe.shutdown()
        for j in jobs:
            assert j.wait(timeout=30)  # resolved (result or error), not hung
            assert j.result is not None

    def test_stream_request_rides_the_lanes(self, tiers):
        fused = AdaptiveCascadePipeline(
            StageManager(tiers), FixedPredictor(0.9),
            PipelineConfig(lam=1.0, enable_caching=False),
        )
        fused_chunks = list(
            fused.stream_request(RequestContext(prompt="stream me", max_tokens=8))
        )
        fused_text = "".join(c for c in fused_chunks if isinstance(c, str))
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.9),
            PipelineConfig(lam=1.0, enable_caching=False),
        )
        try:
            chunks = list(
                pipe.stream_request(RequestContext(prompt="stream me", max_tokens=8))
            )
        finally:
            pipe.shutdown()
        meta = chunks[-1]
        assert isinstance(meta, dict) and meta["chunks"] >= 1
        text = "".join(c for c in chunks[:-1])
        # same tier routing + greedy decoding => identical streamed text
        assert text == fused_text

    def test_stats_and_stage_distribution(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor([0.4, 0.9]),
            PipelineConfig(lam=0.01, enable_caching=False),
        )
        try:
            pipe.batch_process(
                [RequestContext(prompt=f"p{i}", max_tokens=6) for i in range(3)],
                timeout=180,
            )
            s = pipe.get_stats()
            assert s["total_requests"] == 3
            assert s["stage_distribution"][1] == 1.0  # all escalated
        finally:
            pipe.shutdown()


class TestScheduledResponseCache:
    """Per-(request, stage) response caching in scheduled mode (fused-plane
    parity, VERDICT r1 #9): a repeated request_id+prompt resolves from the
    cache without touching that tier's lanes."""

    def test_cache_hit_short_circuits_lanes(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.95),
            PipelineConfig(lam=1.0, enable_caching=True),
        )
        try:
            req = RequestContext(
                request_id="cache-me", prompt="easy one", max_tokens=8
            )
            r1 = pipe.process_request(req, timeout=120)
            completed_before = pipe.schedulers[0].stats()["completed"]
            r2 = pipe.process_request(
                RequestContext(
                    request_id="cache-me", prompt="easy one", max_tokens=8
                ),
                timeout=120,
            )
            assert r1.succeeded and r2.succeeded
            assert r2.text == r1.text
            assert pipe.get_stats()["cache"]["hits"] >= 1 or (
                pipe._stats["cache_hits"] >= 1
            )
            # the cached replay never entered tier 0's lanes
            assert pipe.schedulers[0].stats()["completed"] == completed_before
        finally:
            pipe.shutdown()

    def test_different_prompt_same_id_not_served_from_cache(self, tiers):
        pipe = ScheduledCascadePipeline(
            StageManager(tiers), FixedPredictor(0.95),
            PipelineConfig(lam=1.0, enable_caching=True),
        )
        try:
            r1 = pipe.process_request(
                RequestContext(request_id="rid", prompt="first prompt",
                               max_tokens=6), timeout=120,
            )
            r2 = pipe.process_request(
                RequestContext(request_id="rid", prompt="another prompt!",
                               max_tokens=6), timeout=120,
            )
            assert r1.succeeded and r2.succeeded
            assert r2.text != "" and r1.text != ""
        finally:
            pipe.shutdown()


class TestLaneTopP:
    """Per-lane nucleus sampling (VERDICT r1 #9: top_p in lanes)."""

    def test_tiny_top_p_reduces_to_greedy(self, engine):
        """top_p -> 0 keeps only each row's top token: a temperature-1 lane
        must then reproduce the greedy lane's deterministic output."""
        prompt = [3, 14, 15, 9]
        ref = engine.generate([prompt], max_new=8)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(engine, max_batch=2, max_context=128)
        r = sched.submit(prompt, max_new=8, temperature=1.0, top_p=1e-6)
        sched.run_until_idle()
        assert r.done and not r.error
        assert r.out_tokens == ref

    def test_top_p_respected_in_scan_mode(self, engine):
        prompt = [7, 8, 9]
        ref = engine.generate([prompt], max_new=10)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(
            engine, max_batch=2, max_context=128, scan_steps=4
        )
        r = sched.submit(prompt, max_new=10, temperature=0.9, top_p=1e-6)
        sched.run_until_idle()
        assert r.done and not r.error
        assert r.out_tokens == ref

    def test_full_top_p_still_samples(self, engine):
        """top_p = 1.0 at temperature 1 must NOT be greedy (distribution
        intact): over several seeds the sampled outputs differ from greedy."""
        prompt = [5, 5, 5]
        ref = engine.generate([prompt], max_new=12)[0].token_ids.tolist()
        diffs = 0
        for i in range(4):
            sched = ContinuousBatchingScheduler(engine, max_batch=1,
                                                max_context=128)
            sched._admission_seq = 100 + i * 7  # vary sampling keys
            r = sched.submit(prompt, max_new=12, temperature=1.0, top_p=1.0)
            sched.run_until_idle()
            assert r.done and not r.error
            diffs += int(r.out_tokens != ref)
        assert diffs >= 1


class TestSpeculativePrefetch:
    """Speculative prefix prefetch (cascade/scheduled.py _maybe_prefetch):
    escalation-likely prompts pre-warm the next tier's prefix cache so the
    verify admission prefills only the draft suffix."""

    def _pipe(self, predictor_q, *, prefetch, threshold=0.5):
        stages = []
        for i, name in enumerate(["small", "large"]):
            params = init_params(TINY, jax.random.key(i + 1), dtype=jnp.float32)
            eng = TierEngine(TINY, params, page_size=PAGE, n_pages=256,
                             use_pallas=False, enable_prefix_cache=True)
            stages.append(EngineTextStage(eng, _tok, _detok, name=name,
                                          cost_per_token=float(i * 3 + 1)))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), FixedPredictor(predictor_q),
            # direct_entry off: these tests exercise the tier-0 -> tier-1
            # prefetch/escalation machinery, which a 0.2 prompt score would
            # otherwise bypass by entering tier 1 directly
            PipelineConfig(lam=0.01, enable_caching=False,
                           min_draft_quality_for_verify=0.0,
                           enable_prefetch=prefetch,
                           prefetch_threshold=threshold,
                           direct_entry=False),
            max_batch=4, max_context=256,
        )
        return pipe, stages

    def test_prefetch_warms_target_tier_and_output_unchanged(self):
        # long prompt (several pages) so the prefix reuse is visible
        prompt = "escalate this please " * 6
        base, _ = self._pipe([0.2, 0.9], prefetch=False)
        try:
            want = base.process_request(
                RequestContext(prompt=prompt, max_tokens=8), timeout=120)
        finally:
            base.shutdown()
        assert want.final_stage == 1  # low score escalates

        pipe, stages = self._pipe([0.2, 0.9], prefetch=True)
        try:
            res = pipe.process_request(
                RequestContext(prompt=prompt, max_tokens=8), timeout=120)
            assert res.error is None
            assert res.final_stage == 1
            assert res.text == want.text  # prefetch must not change output
            assert pipe.get_stats().get("prefetches", 0) == 1
            pc = stages[1].engine.prefix_cache.stats()
            assert pc["hits"] >= 1  # the verify admission reused the prompt
        finally:
            pipe.shutdown()

    def test_confident_prompt_not_prefetched(self):
        pipe, stages = self._pipe(0.9, prefetch=True)
        try:
            res = pipe.process_request(
                RequestContext(prompt="easy question", max_tokens=6), timeout=120)
            assert res.error is None
            assert pipe.get_stats().get("prefetches", 0) == 0
        finally:
            pipe.shutdown()

    def test_prefetch_suppressed_under_saturation(self):
        """On shared hardware a prefetch prefill steals device time from
        every tier, so when ANY tier runs a backlog beyond its free lanes
        the prefetch must self-suppress (measured under saturating load,
        always-on prefetch lowered throughput and raised p99)."""
        pipe, stages = self._pipe([0.2, 0.9], prefetch=True)
        try:
            # flood tier 0's queue without starting the dispatch thread:
            # queued work > free lanes -> backlogged() -> prefetch skipped
            sched0 = pipe.schedulers[0]
            for j in range(sched0.max_batch + 2):
                sched0.submit([1, 2, 3], max_new=2, request_id=f"flood{j}")
            assert sched0.backlogged()
            pipe._maybe_prefetch(
                RequestContext(prompt="escalate this please " * 6,
                               max_tokens=8),
                tier=1, score=0.0,
            )
            stats = pipe.get_stats()
            assert stats.get("prefetches", 0) == 0
            assert stats.get("prefetch_suppressed", 0) == 1
            # with the backlog drained the same call fires
            pipe.start()
            deadline = time.time() + 60
            while sched0.backlogged() and time.time() < deadline:
                time.sleep(0.01)
            assert not sched0.backlogged()
            pipe._maybe_prefetch(
                RequestContext(prompt="escalate this please " * 6,
                               max_tokens=8),
                tier=1, score=0.0,
            )
            assert pipe.get_stats().get("prefetches", 0) == 1
        finally:
            pipe.shutdown()

    def test_chain_prefetch_warms_third_tier(self):
        """An escalation to tier 1 chain-prefetches tier 2 (scored by tier
        1's own prompt-conditional acceptance estimate), so the second
        escalation's verify admission also reuses the prompt pages."""
        stages = []
        for i, name in enumerate(["small", "mid", "large"]):
            params = init_params(TINY, jax.random.key(i + 1), dtype=jnp.float32)
            eng = TierEngine(TINY, params, page_size=PAGE, n_pages=256,
                             use_pallas=False, enable_prefix_cache=True)
            stages.append(EngineTextStage(eng, _tok, _detok, name=name,
                                          cost_per_token=float(i * 3 + 1)))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), FixedPredictor(0.2),
            # sequential walk isolated from prompt-conditional routing: a
            # 0.2 prompt score would otherwise direct-enter / skip to tier 2
            PipelineConfig(lam=0.01, enable_caching=False,
                           min_draft_quality_for_verify=0.0,
                           enable_prefetch=True,
                           prompt_conditional_priors=False),
            max_batch=4, max_context=256,
        )
        try:
            prompt = "escalate this twice please " * 6
            res = pipe.process_request(
                RequestContext(prompt=prompt, max_tokens=8), timeout=240)
            assert res.error is None
            assert res.final_stage == 2  # 0.2 score escalates twice
            # arrival prefetch (tier 1) + chain prefetch (tier 2)
            assert pipe.get_stats().get("prefetches", 0) == 2
            assert stages[2].engine.prefix_cache.stats()["hits"] >= 1
        finally:
            pipe.shutdown()

    def test_prefetch_refs_drain(self):
        pipe, stages = self._pipe([0.2, 0.9], prefetch=True)
        try:
            for i in range(3):
                pipe.process_request(
                    RequestContext(prompt=f"hard task {i} " * 5, max_tokens=6),
                    timeout=120)
        finally:
            pipe.shutdown()
        assert stages[1].engine.prefix_cache.stats()["held_refs"] == 0


class TestScheduledDirectEntry:
    """Prompt-conditional direct entry on the scheduled plane: a prompt the
    predictor rates hopeless for tier 0 joins tier 1's lanes directly."""

    def _pipe(self, prompt_scores):
        class PromptAware:
            def predict(self, prompt, draft, logprobs, stage):
                from adaptive_sd_tpu.core.types import PredictionResult

                q = prompt_scores[stage] if draft == "" else 0.9
                return PredictionResult(quality_score=q)

        stages = []
        for i, name in enumerate(["small", "large"]):
            params = init_params(TINY, jax.random.key(i + 1), dtype=jnp.float32)
            eng = TierEngine(TINY, params, page_size=PAGE, n_pages=128,
                             use_pallas=False)
            stages.append(EngineTextStage(eng, _tok, _detok, name=name,
                                          cost_per_token=float(i * 3 + 1)))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), PromptAware(),
            PipelineConfig(lam=1.0, enable_caching=False,
                           risk_alpha=1e-6, risk_beta=1e-6),
            max_batch=2, max_context=128,
        )
        pipe._obs_n[:] = 1000  # neutralise cold-start Bayesian shrinkage
        return pipe

    def test_hard_prompt_enters_tier1_directly(self):
        pipe = self._pipe([0.05, 0.9])
        try:
            res = pipe.process_request(
                RequestContext(prompt="impossible for the draft tier",
                               max_tokens=6), timeout=120)
            assert res.error is None
            assert [sr.stage_index for sr in res.stage_results] == [1]
        finally:
            pipe.shutdown()

    def test_easy_prompt_enters_tier0(self):
        pipe = self._pipe([0.9, 0.95])
        try:
            res = pipe.process_request(
                RequestContext(prompt="trivial", max_tokens=6), timeout=120)
            assert res.error is None
            assert [sr.stage_index for sr in res.stage_results] == [0]
        finally:
            pipe.shutdown()
