"""Engine integration tests on CPU: model forward consistency, paged cache
correctness (decode equals full-context prefill), fused generation, allocator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.core.exceptions import ResourceError
from adaptive_sd_tpu.engine import PageAllocator, PagedKVCache, TierEngine
from adaptive_sd_tpu.models import TINY, init_params, quantize_model
from adaptive_sd_tpu.models.qwen import decode_step, prefill

PAGE = 16  # small pages so tests cross page boundaries


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, jax.random.key(0), dtype=jnp.float32)


class TestPageAllocator:
    def test_alloc_free_cycle(self):
        a = PageAllocator(10)
        p = a.alloc("r1", 4)
        assert len(p) == 4 and len(set(p)) == 4
        assert a.stats().free_pages == 6
        assert a.free_request("r1") == 4
        assert a.stats().free_pages == 10

    def test_ensure_grows(self):
        a = PageAllocator(10)
        assert len(a.ensure("r", 3)) == 3
        assert len(a.ensure("r", 5)) == 5
        assert len(a.ensure("r", 2)) == 5  # never shrinks

    def test_free_from_truncation(self):
        a = PageAllocator(10)
        a.alloc("r", 6)
        assert a.free_from("r", 2) == 4
        assert len(a.pages_of("r")) == 2
        assert a.stats().free_pages == 8

    def test_exhaustion_raises(self):
        a = PageAllocator(4)
        a.alloc("r1", 3)
        with pytest.raises(ResourceError):
            a.alloc("r2", 2)
        assert a.stats().failed_allocs == 1


class TestKVCacheModel:
    def test_decode_matches_prefill(self, tiny_params):
        """Feeding tokens one-by-one through decode_step must produce the same
        final logits as a single prefill over the whole sequence."""
        B, S = 2, 11
        rng = np.random.default_rng(3)
        toks = jnp.asarray(rng.integers(1, TINY.vocab_size, size=(B, S)), jnp.int32)
        seq_lens = jnp.asarray([S, S - 4], jnp.int32)
        tables = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)

        cache1 = PagedKVCache.create(TINY, n_pages=8, page_size=PAGE)
        logits_pre, _ = prefill(
            tiny_params, TINY, toks, seq_lens, cache1, tables, use_pallas=False
        )

        cache2 = PagedKVCache.create(TINY, n_pages=8, page_size=PAGE)
        logits_dec = None
        for b_len, b in [(S, 0), (S - 4, 1)]:
            pass
        # run decode token-by-token for the full batch using per-step positions
        last = {0: None, 1: None}
        for t in range(S):
            positions = jnp.asarray([t, min(t, S - 5)], jnp.int32)
            step_toks = toks[:, t]
            # batch element 1 stops advancing after its length; mask by
            # re-feeding its last valid token at a frozen position
            step_toks = jnp.asarray(
                [int(toks[0, t]), int(toks[1, min(t, S - 5)])], jnp.int32
            )
            logits_dec, cache2 = decode_step(
                tiny_params, TINY, step_toks, positions, cache2, tables, use_pallas=False
            )
            for b in (0, 1):
                if t == int(seq_lens[b]) - 1:
                    last[b] = logits_dec[b]

        # Tolerance covers INT8 KV quantization: prefill attends over raw f32
        # K/V while decode reads the quantized cache pages.
        for b in (0, 1):
            np.testing.assert_allclose(
                np.asarray(last[b]), np.asarray(logits_pre[b]), rtol=0.1, atol=0.06
            )

    def test_cache_write_decode_targets_correct_page(self):
        cache = PagedKVCache.create(TINY, n_pages=4, page_size=PAGE)
        B, n_kv, D = 1, TINY.n_kv_heads, TINY.head_dim
        k = jnp.ones((B, n_kv, D)) * 0.5
        v = jnp.ones((B, n_kv, D)) * -0.25
        tables = jnp.asarray([[2, 0]], jnp.int32)
        # position 17 -> page index 1 in the table -> physical page 0, slot 1
        cache = cache.write_decode(0, k, v, tables, jnp.asarray([PAGE + 1], jnp.int32))
        assert float(jnp.abs(cache.k_pages[0][:, 0, 1]).sum()) > 0
        assert float(jnp.abs(cache.k_pages[0][:, 2]).sum()) == 0  # page 2 untouched
        assert float(jnp.abs(cache.k_pages[0][:, 0, 0]).sum()) == 0  # slot 0 untouched

    def test_prefill_write_masks_padding(self):
        cache = PagedKVCache.create(TINY, n_pages=4, page_size=PAGE)
        B, S, n_kv, D = 1, PAGE * 2, TINY.n_kv_heads, TINY.head_dim
        k = jnp.ones((B, S, n_kv, D))
        v = jnp.ones((B, S, n_kv, D))
        tables = jnp.asarray([[1, 3]], jnp.int32)
        cache = cache.write_prefill(0, k, v, tables, jnp.asarray([5], jnp.int32))
        # only 5 slots of page 1 written; page 3 untouched
        assert float(jnp.abs(cache.k_pages[0][:, 1, :5]).sum()) > 0
        assert float(jnp.abs(cache.k_pages[0][:, 1, 5:]).sum()) == 0
        assert float(jnp.abs(cache.k_pages[0][:, 3]).sum()) == 0


class TestTierEngine:
    def test_generate_greedy_deterministic(self, tiny_params):
        eng = TierEngine(
            TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False
        )
        outs1 = eng.generate([[1, 2, 3], [4, 5, 6, 7, 8]], max_new=6)
        outs2 = eng.generate([[1, 2, 3], [4, 5, 6, 7, 8]], max_new=6)
        assert len(outs1) == 2
        for a, b in zip(outs1, outs2):
            assert a.num_tokens == 6
            np.testing.assert_array_equal(a.token_ids, b.token_ids)
        assert eng.allocator.stats().active_requests == 0  # pages reclaimed

    def test_generate_matches_stepwise_model(self, tiny_params):
        """Fused while-loop generation must equal a hand-rolled greedy loop."""
        prompt = [3, 14, 15, 9, 2]
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        fused = eng.generate([prompt], max_new=5)[0]

        cache = PagedKVCache.create(TINY, n_pages=8, page_size=PAGE)
        tables = jnp.asarray([list(range(8))], jnp.int32)
        toks = jnp.asarray([prompt], jnp.int32)
        # manual: prefill then argmax-feed
        S = len(prompt)
        logits, cache = prefill(
            tiny_params, TINY, toks, jnp.asarray([S], jnp.int32), cache, tables, use_pallas=False
        )
        expect = []
        cur = int(jnp.argmax(logits[0]))
        for i in range(5):
            expect.append(cur)
            logits, cache = decode_step(
                tiny_params,
                TINY,
                jnp.asarray([cur], jnp.int32),
                jnp.asarray([S + i], jnp.int32),
                cache,
                tables,
                use_pallas=False,
            )
            cur = int(jnp.argmax(logits[0]))
        assert fused.token_ids.tolist() == expect

    def test_eos_stops_generation(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        probe = eng.generate([[1, 2, 3]], max_new=4)[0]
        assert probe.num_tokens == 4
        eos = int(probe.token_ids[1])  # second generated token as eos
        eng2 = TierEngine(
            TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False, eos_id=eos
        )
        out = eng2.generate([[1, 2, 3]], max_new=4)[0]
        assert out.num_tokens == 2  # first token + the eos itself

    def test_quantized_params_run(self, tiny_params):
        qparams = quantize_model(tiny_params, bits=8)
        eng = TierEngine(TINY, qparams, page_size=PAGE, n_pages=64, use_pallas=False)
        out = eng.generate([[1, 2, 3, 4]], max_new=3)[0]
        assert out.num_tokens == 3

    def test_model_info(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=16, use_pallas=False)
        info = eng.get_model_info()
        assert info["spec"] == "tiny" and info["memory_bytes"] > 0


class TestVerifyContinue:
    def test_self_verify_accepts_own_draft(self, tiny_params):
        """A model verifying its OWN greedy draft must accept every token and
        continue exactly as plain generation would."""
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        prompt = [5, 9, 13]
        full = eng.generate([prompt], max_new=8)[0]
        draft = full.token_ids[:4].tolist()
        out, n_acc = eng.verify_continue([prompt], [draft], max_new=8)[0]
        assert n_acc == 4
        assert out.token_ids.tolist() == full.token_ids.tolist()

    def test_garbage_draft_rejected_and_corrected(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        prompt = [5, 9, 13]
        full = eng.generate([prompt], max_new=6)[0]
        wrong_first = (int(full.token_ids[0]) + 1) % TINY.vocab_size or 1
        out, n_acc = eng.verify_continue([prompt], [[wrong_first, 3, 3]], max_new=6)[0]
        assert n_acc == 0
        assert out.token_ids.tolist() == full.token_ids.tolist()

    def test_partial_acceptance(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        prompt = [7, 2, 21, 4]
        full = eng.generate([prompt], max_new=8)[0]
        draft = full.token_ids[:3].tolist()
        draft[2] = (draft[2] + 5) % TINY.vocab_size or 1  # corrupt 3rd token
        out, n_acc = eng.verify_continue([prompt], [draft], max_new=8)[0]
        assert n_acc == 2
        assert out.token_ids.tolist() == full.token_ids.tolist()

    def test_batch_mixed_acceptance(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128, use_pallas=False)
        prompts = [[5, 9, 13], [7, 2, 21, 4]]
        fulls = eng.generate(prompts, max_new=6)
        drafts = [fulls[0].token_ids[:3].tolist(), [1, 1]]
        outs = eng.verify_continue(prompts, drafts, max_new=6)
        assert outs[0][1] == 3
        for (out, _), full in zip(outs, fulls):
            assert out.token_ids.tolist() == full.token_ids.tolist()


class TestContinuousBatchingScheduler:
    def _engine(self, tiny_params, eos=None):
        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                          use_pallas=False, eos_id=eos)

    def test_matches_fused_generation(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        fused = eng.generate([[3, 14, 15], [9, 2, 6, 5]], max_new=5)
        sched = ContinuousBatchingScheduler(eng, max_batch=4, max_context=128)
        r1 = sched.submit([3, 14, 15], max_new=5)
        r2 = sched.submit([9, 2, 6, 5], max_new=5)
        sched.run_until_idle()
        assert r1.done and r2.done and not r1.error
        assert r1.out_tokens == fused[0].token_ids.tolist()
        assert r2.out_tokens == fused[1].token_ids.tolist()
        assert eng.allocator.stats().active_requests == 0

    def test_staggered_admission(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        expected = [o.token_ids.tolist() for o in eng.generate(
            [[1, 2], [7, 8, 9]], max_new=4)]
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=64)
        a = sched.submit([1, 2], max_new=4)
        sched.step()  # a admitted and stepped alone
        b = sched.submit([7, 8, 9], max_new=4)  # joins mid-flight
        sched.run_until_idle()
        assert a.out_tokens == expected[0]
        assert b.out_tokens == expected[1]

    def test_more_requests_than_lanes(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=64)
        reqs = [sched.submit([i + 1, i + 2], max_new=3) for i in range(5)]
        sched.run_until_idle()
        assert all(r.done and len(r.out_tokens) == 3 for r in reqs)
        assert sched.stats()["completed"] == 5

    def test_context_overflow_rejected(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=32)
        with pytest.raises(ResourceError):
            sched.submit(list(range(1, 30)), max_new=16)

    def test_native_and_python_lanes_agree(self, tiny_params):
        """The C++ lane table and the Python scan must schedule
        identically (same admissions, same outputs) under staggered load."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
        from adaptive_sd_tpu.engine import native_bridge

        def run(force_python):
            eng = self._engine(tiny_params)
            sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=64)
            if force_python:
                sched._nlanes = None
            a = sched.submit([1, 2], max_new=5)
            sched.step()
            b = sched.submit([7, 8, 9], max_new=4)
            c = sched.submit([4, 4], max_new=3)
            sched.run_until_idle()
            return [a.out_tokens, b.out_tokens, c.out_tokens]

        py = run(True)
        if not native_bridge.native_available():
            pytest.skip("native library not built")
        nat = run(False)
        assert py == nat

    def test_mixed_temperature_lanes(self, tiny_params):
        """Greedy and sampling requests share a batch: greedy lanes must
        be unaffected by sampling lanes (per-row temperature in the fused
        decode+sample graph)."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        expected = eng.generate([[3, 14, 15]], max_new=5)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(eng, max_batch=4, max_context=64)
        g = sched.submit([3, 14, 15], max_new=5, temperature=0.0)
        s1 = sched.submit([9, 2, 6], max_new=5, temperature=1.0)
        s2 = sched.submit([5, 5], max_new=5, temperature=0.7)
        sched.run_until_idle()
        assert g.out_tokens == expected
        assert len(s1.out_tokens) == 5 and len(s2.out_tokens) == 5


class TestPreemption:
    """KV-page pressure policy: transient exhaustion must never error a
    request — the newest lane is preempted (pages reclaimed, recompute
    re-admission) and completes later with identical output (VERDICT #4;
    role parity: vLLM swap/recompute, SURVEY.md §2.8)."""

    def _engine(self, tiny_params, n_pages):
        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=n_pages,
                          use_pallas=False)

    @pytest.mark.parametrize("scan_steps", [1, 4])
    def test_preempted_request_completes_identically(self, tiny_params, scan_steps):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        prompts = [[3, 14, 15, 9, 2, 6], [7, 8, 9, 1]]
        ref_eng = self._engine(tiny_params, n_pages=64)
        expected = [o.token_ids.tolist()
                    for o in ref_eng.generate(prompts, max_new=30)]

        # Pool sized so both admit (2 pages each) but the pool exhausts when
        # decoding crosses page boundaries: 2 lanes eventually need 3 pages
        # each (prompt + 30 tokens = 36 positions) against a 4-page pool.
        eng = self._engine(tiny_params, n_pages=4)
        sched = ContinuousBatchingScheduler(
            eng, max_batch=2, max_context=128, scan_steps=scan_steps
        )
        a = sched.submit(prompts[0], max_new=30)
        b = sched.submit(prompts[1], max_new=30)
        sched.run_until_idle()
        assert a.done and b.done and not a.error and not b.error
        assert a.out_tokens == expected[0]
        assert b.out_tokens == expected[1]
        assert sched.preemptions >= 1
        assert (a.preemptions + b.preemptions) == sched.preemptions
        assert eng.allocator.stats().active_requests == 0

    def test_admission_waits_instead_of_failing(self, tiny_params):
        """Arrivals beyond pool capacity queue (FIFO) rather than erroring;
        everything completes as lanes drain."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params, n_pages=4)
        sched = ContinuousBatchingScheduler(eng, max_batch=4, max_context=128)
        reqs = [
            sched.submit([i + 1, i + 2, i + 3], max_new=20) for i in range(5)
        ]
        sched.run_until_idle()
        assert all(r.done and not r.error for r in reqs)
        assert all(len(r.out_tokens) == 20 for r in reqs)
        assert eng.allocator.stats().active_requests == 0

    def test_impossible_request_fails_cleanly(self, tiny_params):
        """A request that cannot fit even into an EMPTY pool fails with an
        error instead of looping forever."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params, n_pages=2)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=128)
        r = sched.submit(list(range(1, 41)), max_new=8)  # needs 4 pages, pool 2
        sched.run_until_idle()
        assert r.done and r.error is not None
        assert eng.allocator.stats().active_requests == 0

    def test_loop_thread_survives_step_failure(self, tiny_params):
        """An unexpected step() exception fails the active lanes (requests
        see the error) but the scheduler thread keeps serving new work."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params, n_pages=64)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=64)
        sched.start()
        boom = {"armed": True}
        orig = eng.decode_sample_batch

        def flaky(*args, **kwargs):
            if boom.pop("armed", False):
                raise RuntimeError("injected device failure")
            return orig(*args, **kwargs)

        eng.decode_sample_batch = flaky
        r1 = sched.submit([1, 2, 3], max_new=6)
        assert r1.wait(30.0)
        assert r1.error is not None and "injected" in r1.error
        r2 = sched.submit([4, 5, 6], max_new=6)
        assert r2.wait(30.0)
        assert not r2.error and len(r2.out_tokens) == 6
        sched.stop()


class TestFetchHost:
    """_fetch_host: single-round-trip packed device->host fetch (through the
    remote-dispatch tunnel each device_get LEAF pays a full round trip; the
    serving hot paths fetch 3-6 leaves per dispatch). Must be bit-exact for
    int32 (lossless bitcast), exact for bool and f32, and preserve the tree
    structure including None and empty tuples."""

    def test_roundtrip_exact(self):
        from adaptive_sd_tpu.engine.decode import _fetch_host

        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(-(2**31), 2**31 - 1, (4, 7),
                                        dtype=np.int32))
        lps = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
        flags = jnp.asarray(rng.random(4) < 0.5)
        tree = (toks, lps, flags, None, (jnp.asarray([3], np.int32),), ())
        out = _fetch_host(tree)
        assert np.array_equal(out[0], np.asarray(toks))
        assert out[0].dtype == np.int32
        assert np.array_equal(out[1], np.asarray(lps))
        assert np.array_equal(out[2], np.asarray(flags))
        assert out[2].dtype == bool
        assert out[3] is None
        assert out[4][0].tolist() == [3]
        assert out[5] == ()

    def test_single_leaf_passthrough(self):
        from adaptive_sd_tpu.engine.decode import _fetch_host

        x = jnp.arange(5, dtype=jnp.int32)
        assert np.array_equal(_fetch_host((x,))[0], np.arange(5))

    def test_packer_cache_reused(self):
        from adaptive_sd_tpu.engine.decode import _FETCH_PACKERS, _fetch_host

        a = (jnp.zeros((2, 3), jnp.int32), jnp.ones((2,), jnp.float32))
        _fetch_host(a)
        n0 = len(_FETCH_PACKERS)
        _fetch_host(a)  # same signature: no new packer
        assert len(_FETCH_PACKERS) == n0


class TestSwapPreemption:
    """Swap-mode preemption: the page-pressure victim's live KV pages are
    copied to host memory and restored bit-exactly at re-admission — no
    recompute. vLLM's SWAP flavour next to the recompute flavour above
    (the capability the reference rents, SURVEY.md §2.8)."""

    def _engine(self, tiny_params, n_pages):
        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=n_pages,
                          use_pallas=False)

    def test_swap_roundtrip_is_bit_exact(self, tiny_params):
        """swap_out → clobber → swap_in restores page contents exactly."""
        eng = self._engine(tiny_params, n_pages=8)
        pages = eng.allocator.alloc("r", 2)
        tables = np.full((1, 4), eng.allocator.n_pages, np.int32)
        tables[0, :2] = pages
        toks = np.arange(1, 21, dtype=np.int32)[None, :] % TINY.vocab_size
        eng.prefill_batch(jnp.asarray(toks), jnp.asarray([20]),
                          jnp.asarray(tables))
        blob = eng.swap_out_pages(list(pages))
        snap = [np.asarray(b).copy() for b in blob]
        eng.prefill_batch(jnp.asarray(toks[:, ::-1].copy()), jnp.asarray([20]),
                          jnp.asarray(tables))
        clobbered = eng.swap_out_pages(list(pages))
        assert any(not np.array_equal(a, b) for a, b in zip(snap, clobbered))
        eng.swap_in_pages(list(pages), blob)
        restored = eng.swap_out_pages(list(pages))
        for a, b in zip(snap, restored):
            assert np.array_equal(a, b)

    def test_swap_blob_is_compact_for_non_pow2_counts(self, tiny_params):
        """The gather pads page counts to pow2 for graph bucketing, but the
        returned blob must be sliced back to the REAL page count: callers
        account blob.nbytes against host swap/spill budgets, and a padded
        single-page blob would charge 2x its footprint (and hold duplicate
        page-0 copies in host memory). Round-trip must still be bit-exact
        through the internal re-pad."""
        eng = self._engine(tiny_params, n_pages=8)
        pages = eng.allocator.alloc("r", 3)
        tables = np.full((1, 4), eng.allocator.n_pages, np.int32)
        tables[0, :3] = pages
        toks = np.arange(1, 25, dtype=np.int32)[None, :] % TINY.vocab_size
        eng.prefill_batch(jnp.asarray(toks), jnp.asarray([24]),
                          jnp.asarray(tables))
        blob = eng.swap_out_pages(list(pages))
        assert all(int(b.shape[2]) == 3 for b in blob)  # compact, not 4
        one = eng.swap_out_pages([int(pages[0])])
        assert all(int(b.shape[2]) == 1 for b in one)   # compact, not 2
        snap = [np.asarray(b).copy() for b in blob]
        eng.prefill_batch(jnp.asarray(toks[:, ::-1].copy()), jnp.asarray([24]),
                          jnp.asarray(tables))
        eng.swap_in_pages(list(pages), blob)
        restored = eng.swap_out_pages(list(pages))
        for a, b in zip(snap, restored):
            assert np.array_equal(a, b)

    @pytest.mark.parametrize("scan_steps", [1, 4])
    def test_swap_preempted_request_completes_identically(
        self, tiny_params, scan_steps
    ):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        prompts = [[3, 14, 15, 9, 2, 6], [7, 8, 9, 1]]
        ref_eng = self._engine(tiny_params, n_pages=64)
        expected = [o.token_ids.tolist()
                    for o in ref_eng.generate(prompts, max_new=30)]

        eng = self._engine(tiny_params, n_pages=4)  # pressure geometry: see
        sched = ContinuousBatchingScheduler(       # TestPreemption above
            eng, max_batch=2, max_context=128, scan_steps=scan_steps,
            preemption_mode="swap",
        )
        a = sched.submit(prompts[0], max_new=30)
        b = sched.submit(prompts[1], max_new=30)
        sched.run_until_idle()
        assert a.done and b.done and not a.error and not b.error
        assert a.out_tokens == expected[0]
        assert b.out_tokens == expected[1]
        assert sched.swap_preemptions >= 1
        st = sched.stats()
        assert st["swap_bytes_held"] == 0          # every blob restored
        assert st["preemption_mode"] == "swap"
        assert eng.allocator.stats().active_requests == 0

    def test_swap_budget_exhausted_falls_back_to_recompute(self, tiny_params):
        """max_swap_bytes=0: victims cannot afford host offload and take the
        recompute path instead — still identical output, zero host bytes."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        prompts = [[3, 14, 15, 9, 2, 6], [7, 8, 9, 1]]
        ref_eng = self._engine(tiny_params, n_pages=64)
        expected = [o.token_ids.tolist()
                    for o in ref_eng.generate(prompts, max_new=30)]
        eng = self._engine(tiny_params, n_pages=4)
        sched = ContinuousBatchingScheduler(
            eng, max_batch=2, max_context=128,
            preemption_mode="swap", max_swap_bytes=0,
        )
        a = sched.submit(prompts[0], max_new=30)
        b = sched.submit(prompts[1], max_new=30)
        sched.run_until_idle()
        assert a.out_tokens == expected[0] and b.out_tokens == expected[1]
        assert sched.preemptions >= 1 and sched.swap_preemptions == 0
        assert sched.stats()["swap_bytes_held"] == 0

    def test_invalid_mode_rejected(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params, n_pages=8)
        with pytest.raises(ValueError, match="preemption_mode"):
            ContinuousBatchingScheduler(eng, max_batch=2, preemption_mode="page")


class TestStreaming:
    def test_stream_matches_fused(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        fused = eng.generate([[4, 8, 15]], max_new=5)[0]
        streamed = [tok for tok, _ in eng.stream([4, 8, 15], max_new=5)]
        assert streamed == fused.token_ids.tolist()
        assert eng.allocator.stats().active_requests == 0

    def test_stream_stops_at_eos(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        probe = [t for t, _ in eng.stream([4, 8, 15], max_new=4)]
        eos = probe[1]
        eng2 = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64,
                          use_pallas=False, eos_id=eos)
        toks = [t for t, _ in eng2.stream([4, 8, 15], max_new=4)]
        # stops at the FIRST occurrence of eos (which may repeat in probe)
        assert toks == probe[: probe.index(eos) + 1]


class TestActQuant:
    def test_act_quant_engine_outputs_close(self, tiny_params):
        """W8A8 decode must produce closely matching logprob trajectories to
        weight-only int8 (token drift tolerated on a random tiny model, but
        the first tokens should agree)."""
        from adaptive_sd_tpu.models import TINY
        from adaptive_sd_tpu.models.qwen import quantize_model

        q = quantize_model(tiny_params, bits=8)
        a = TierEngine(TINY, q, page_size=PAGE, n_pages=64, use_pallas=False)
        b = TierEngine(TINY, q, page_size=PAGE, n_pages=64, use_pallas=False,
                       act_quant=True)
        # off-TPU act_quant routes through the XLA int8 fallback — same math
        oa = a.generate([[3, 5, 7, 9]], max_new=4)[0]
        ob = b.generate([[3, 5, 7, 9]], max_new=4)[0]
        assert oa.token_ids[0] == ob.token_ids[0]


class TestSchedulerRegressions:
    """Regressions for the code-review findings: idle-lane KV corruption,
    near-max-context admission crash, page leak on failed admission."""

    def test_partial_occupancy_matches_fused(self, tiny_params):
        """One request in a 4-lane scheduler: idle lanes must not corrupt
        the live request's KV (they used to write PAD KV through zeroed
        table rows into page 0)."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128, use_pallas=False)
        fused = eng.generate([[3, 14, 15]], max_new=6)[0]
        sched = ContinuousBatchingScheduler(eng, max_batch=4, max_context=128)
        r = sched.submit([3, 14, 15], max_new=6)
        sched.run_until_idle()
        assert r.out_tokens == fused.token_ids.tolist()

    def test_lane_reuse_after_retire_no_aliasing(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128, use_pallas=False)
        expected = [o.token_ids.tolist() for o in eng.generate(
            [[1, 2], [9, 8, 7]], max_new=5)]
        sched = ContinuousBatchingScheduler(eng, max_batch=1, max_context=64)
        a = sched.submit([1, 2], max_new=5)
        sched.run_until_idle()
        b = sched.submit([9, 8, 7], max_new=5)  # reuses lane 0 + LIFO pages
        sched.run_until_idle()
        assert a.out_tokens == expected[0]
        assert b.out_tokens == expected[1]

    def test_prompt_near_max_context_admits(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128, use_pallas=False)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=32)
        r = sched.submit(list(range(1, 29)), max_new=4)  # 28 tokens, page=16
        sched.run_until_idle()
        assert r.done and not r.error and len(r.out_tokens) == 4

    def test_admission_pressure_parks_then_completes(self, tiny_params):
        """Under transient page pressure admission PARKS the tail instead of
        erroring it (vLLM-style recompute policy): both requests complete once
        pages free up, and nothing leaks."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=3, use_pallas=False)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=48)
        r1 = sched.submit([1] * 17, max_new=2)  # needs 3 pages
        r2 = sched.submit([2] * 17, max_new=2)  # cannot fit alongside -> parked
        sched.step()
        # whoever is running holds its pages legitimately; the parked request
        # holds none (free + held == total, no leak mid-flight)
        assert eng.allocator.stats().free_pages in (0, 3)
        sched.run_until_idle()
        assert r1.done and not r1.error and len(r1.out_tokens) == 2
        assert r2.done and not r2.error and len(r2.out_tokens) == 2
        assert eng.allocator.stats().free_pages == 3  # nothing leaked


class TestVerifyBonusRegression:
    def test_full_draft_acceptance_gets_true_next_token(self, tiny_params):
        """Review finding: with a fully-accepted draft whose length equals the
        bucketed max_draft, the bonus token must be the model's NEXT token,
        not a re-emit of the last draft token."""
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128, use_pallas=False)
        prompt = [3, 14, 15]
        full = eng.generate([prompt], max_new=12)[0]
        draft = full.token_ids[:8].tolist()  # exactly the 8-bucket
        out, n_acc = eng.verify_continue([prompt], [draft], max_new=12)[0]
        assert n_acc == 8
        assert out.token_ids.tolist() == full.token_ids.tolist()


class TestBudgetBucketing:
    def test_odd_max_new_exact_token_count(self, tiny_params):
        """max_new=5 and 7 share the 32-bucket graph but must emit exactly
        their own budgets."""
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        a = eng.generate([[1, 2, 3]], max_new=5)[0]
        b = eng.generate([[1, 2, 3]], max_new=7)[0]
        assert a.num_tokens == 5 and b.num_tokens == 7
        assert b.token_ids[:5].tolist() == a.token_ids.tolist()


class TestEngineStageStreaming:
    def test_engine_text_stage_stream(self, tiny_params):
        from adaptive_sd_tpu.cascade import EngineTextStage

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        st = EngineTextStage(
            eng,
            lambda t: [(ord(c) % 255) + 1 for c in t[:16]] or [1],
            lambda ids: " ".join(map(str, ids)),
            name="s",
        )
        chunks = list(st.stream_text("stream through the stage", max_new=5))
        assert chunks
        full = st.generate_text(["stream through the stage"], max_new=5)[0]
        assert "".join(chunks).strip() == full.text.strip()


class TestFusedProjections:
    def test_fused_matches_unfused_exactly(self, tiny_params):
        """fuse_projections is a pure re-layout: token streams must be
        IDENTICAL (per-channel quantization commutes with output-dim concat)."""
        from adaptive_sd_tpu.models.qwen import fuse_projections, quantize_model

        fused_q = quantize_model(fuse_projections(tiny_params), bits=8)
        plain_q = quantize_model(tiny_params, bits=8)
        e1 = TierEngine(TINY, plain_q, page_size=PAGE, n_pages=64, use_pallas=False)
        e2 = TierEngine(TINY, fused_q, page_size=PAGE, n_pages=64, use_pallas=False)
        a = e1.generate([[3, 14, 15, 9]], max_new=6)[0]
        b = e2.generate([[3, 14, 15, 9]], max_new=6)[0]
        assert a.token_ids.tolist() == b.token_ids.tolist()
        np.testing.assert_allclose(a.logprobs, b.logprobs, rtol=1e-4, atol=1e-5)

    def test_fused_unquantized(self, tiny_params):
        from adaptive_sd_tpu.models.qwen import fuse_projections

        e1 = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=64, use_pallas=False)
        e2 = TierEngine(TINY, fuse_projections(tiny_params), page_size=PAGE,
                        n_pages=64, use_pallas=False)
        a = e1.generate([[5, 6, 7]], max_new=5)[0]
        b = e2.generate([[5, 6, 7]], max_new=5)[0]
        assert a.token_ids.tolist() == b.token_ids.tolist()


class TestStochasticVerify:
    """Temperature>0 speculative escalation: the draft carries its sampling
    distribution (return_topk) and the verifier applies the exact rejection
    rule (ops.sampling.speculative_accept) inside the verify graph."""

    def _engine(self, params, **kw):
        from adaptive_sd_tpu.models import TINY

        return TierEngine(TINY, params, page_size=PAGE, n_pages=128,
                          use_pallas=False, **kw)

    def test_generate_returns_topk(self, tiny_params):
        eng = self._engine(tiny_params)
        out = eng.generate([[1, 2, 3]], max_new=5, temperature=0.8, top_p=0.95,
                           return_topk=8)[0]
        assert out.topk_ids.shape == (out.num_tokens, 8)
        assert out.topk_probs.shape == (out.num_tokens, 8)
        # probs sorted descending, each row sums <= 1, sampled token's prob
        # consistent with its logprob
        assert np.all(np.diff(out.topk_probs, axis=-1) <= 1e-6)
        assert np.all(out.topk_probs.sum(-1) <= 1.0 + 1e-5)
        assert np.all(out.topk_probs >= 0)

    def test_topk_ignored_at_temperature_zero(self, tiny_params):
        eng = self._engine(tiny_params)
        out = eng.generate([[1, 2, 3]], max_new=4, temperature=0.0, return_topk=8)[0]
        assert out.topk_ids is None and out.topk_probs is None

    def test_self_verify_mostly_accepts(self, tiny_params):
        """Verifying a draft from the SAME model/temperature: p ≈ q at every
        position (small paged-int8-KV numeric drift aside), so the rejection
        rule accepts nearly everything."""
        eng = self._engine(tiny_params)
        prompts = [[5, 9, 13], [7, 2, 21, 4], [3, 3, 8], [11, 1]]
        fulls = eng.generate(prompts, max_new=8, temperature=1.0, seed=7,
                             return_topk=TINY_VOCAB)
        drafts = [f.token_ids.tolist() for f in fulls]
        dq = [(f.logprobs, f.topk_ids, f.topk_probs) for f in fulls]
        outs = eng.verify_continue(prompts, drafts, max_new=8, temperature=1.0,
                                   seed=11, draft_q=dq)
        total_acc = sum(n for _, n in outs)
        total_draft = sum(len(d) for d in drafts)
        assert total_acc >= 0.7 * total_draft, (total_acc, total_draft)
        # and outputs continue past the accepted prefix up to max_new
        for out, _ in outs:
            assert out.num_tokens == 8

    def test_stochastic_verify_differs_from_greedy_path(self, tiny_params):
        """With draft_q provided the verify graph takes the stochastic branch;
        results must still honour the accepted-prefix contract (accepted
        tokens == draft prefix)."""
        eng = self._engine(tiny_params)
        prompt = [5, 9, 13]
        full = eng.generate([prompt], max_new=6, temperature=0.9, seed=3,
                            return_topk=TINY_VOCAB)[0]
        draft = full.token_ids.tolist()
        dq = [(full.logprobs, full.topk_ids, full.topk_probs)]
        out, n_acc = eng.verify_continue([prompt], [draft], max_new=6,
                                         temperature=0.9, seed=5, draft_q=dq)[0]
        assert 0 <= n_acc <= len(draft)
        assert out.token_ids[:n_acc].tolist() == draft[:n_acc]

    def test_hopeless_draft_rejected_stochastically(self, tiny_params):
        """A draft the target assigns ~zero probability must be rejected at
        position 0 (q claims high confidence, p disagrees)."""
        eng = self._engine(tiny_params)
        prompt = [5, 9, 13]
        # construct an adversarial draft_q: tokens chosen as the target's
        # LEAST likely continuations, with q claiming prob ~1
        ref = eng.generate([prompt], max_new=1, temperature=1.0, seed=0,
                           return_topk=TINY_VOCAB)[0]
        worst = int(ref.topk_ids[0, -1])  # least-likely token in the support
        draft = [worst, worst, worst]
        from adaptive_sd_tpu.models import TINY

        K = TINY.vocab_size
        lp = np.full((3,), np.log(0.999), np.float32)
        ids = np.tile(np.arange(K, dtype=np.int32), (3, 1))
        pr = np.full((3, K), 1e-6, np.float32)
        pr[:, worst] = 0.999
        accs = []
        for seed in range(6):
            _, n_acc = eng.verify_continue([prompt], [draft], max_new=6,
                                           temperature=1.0, seed=seed,
                                           draft_q=[(lp, ids, pr)])[0]
            accs.append(n_acc)
        assert np.mean(accs) < 1.0, accs


class TestChainedStochasticVerify:
    """Verify outputs carry their own top-K support (return_topk on the
    stochastic path), so a THIRD tier can verify them stochastically — the
    emitted tokens are marginally ~ the verifier's adjusted distribution, so
    its logp_t top-K rows are the exact q for the next rejection test."""

    def test_verify_output_carries_topk(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False)
        prompt = [5, 9, 13]
        K = min(32, TINY.vocab_size)
        full = eng.generate([prompt], max_new=6, temperature=1.0, seed=7,
                            return_topk=K)[0]
        dq = [(full.logprobs, full.topk_ids, full.topk_probs)]
        out, n_acc = eng.verify_continue(
            [prompt], [full.token_ids.tolist()], max_new=6, temperature=1.0,
            seed=11, draft_q=dq, return_topk=K,
        )[0]
        assert out.topk_ids is not None and out.topk_ids.shape == (out.num_tokens, K)
        assert out.topk_probs is not None
        # rows are valid distributions' top-K: descending, sum <= 1
        assert np.all(out.topk_probs >= 0)
        assert np.all(out.topk_probs.sum(-1) <= 1.0 + 1e-5)
        # accepted-prefix rows must be the verifier's own adjusted top-K,
        # hence contain the emitted token for in-support tokens
        for j in range(min(int(n_acc), out.num_tokens)):
            if out.topk_probs[j].sum() > 0.99:  # full support captured
                assert out.token_ids[j] in out.topk_ids[j]

    def test_three_tier_chain_runs(self, tiny_params):
        engs = [TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                           use_pallas=False) for _ in range(3)]
        prompt = [7, 2, 21, 4]
        K = min(32, TINY.vocab_size)
        d0 = engs[0].generate([prompt], max_new=6, temperature=0.8, seed=1,
                              return_topk=K)[0]
        v1, n1 = engs[1].verify_continue(
            [prompt], [d0.token_ids.tolist()], max_new=6, temperature=0.8,
            seed=2, draft_q=[(d0.logprobs, d0.topk_ids, d0.topk_probs)],
            return_topk=K,
        )[0]
        # same weights -> tier 1 accepts most of tier 0's draft
        assert n1 >= 3
        v2, n2 = engs[2].verify_continue(
            [prompt], [v1.token_ids.tolist()], max_new=6, temperature=0.8,
            seed=3, draft_q=[(v1.logprobs, v1.topk_ids, v1.topk_probs)],
        )[0]
        assert 0 <= n2 <= v1.num_tokens
        assert v2.token_ids[:n2].tolist() == v1.token_ids.tolist()[:n2]
        # identical weights again: acceptance should be high
        assert n2 >= 3

    def test_greedy_verify_has_no_topk(self, tiny_params):
        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False)
        prompt = [5, 9, 13]
        full = eng.generate([prompt], max_new=6)[0]
        out, _ = eng.verify_continue(
            [prompt], [full.token_ids[:3].tolist()], max_new=6, return_topk=8
        )[0]
        assert out.topk_ids is None  # greedy path emits no q support


TINY_VOCAB = 0  # set below from the spec


def _set_tiny_vocab():
    from adaptive_sd_tpu.models import TINY

    global TINY_VOCAB
    TINY_VOCAB = min(32, TINY.vocab_size)


_set_tiny_vocab()


class TestPriorityScheduling:
    """RequestContext.priority drives admission order and preemption
    victim choice (reference surface: core/types.py priority field)."""

    def test_high_priority_admits_first(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False)
        # one lane: queued requests admit strictly by priority
        sched = ContinuousBatchingScheduler(eng, max_batch=1, max_context=64)
        low = sched.submit([1, 2, 3], max_new=2, priority=0)
        high = sched.submit([4, 5, 6], max_new=2, priority=5)
        sched.run_until_idle()
        assert low.done and high.done
        assert high.finished_at < low.finished_at  # high jumped the queue

    def test_fifo_within_priority_level(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False)
        sched = ContinuousBatchingScheduler(eng, max_batch=1, max_context=64)
        first = sched.submit([1, 2], max_new=2)
        second = sched.submit([3, 4], max_new=2)
        sched.run_until_idle()
        assert first.finished_at < second.finished_at

    def test_low_priority_preempted_first(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=6,
                         use_pallas=False)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=96)
        # admit a HIGH-priority request first, then a LOW one; drive page
        # pressure so a victim must be chosen: the low-priority lane loses
        # its pages even though it arrived later AND the high one is older
        high = sched.submit([1] * 30, max_new=24, priority=5)
        low = sched.submit([2] * 30, max_new=24, priority=0)
        sched.run_until_idle()
        assert high.done and low.done and not high.error and not low.error
        if sched.preemptions:
            assert low.preemptions >= high.preemptions


class TestWarmup:
    """scheduler.warmup(): the precompiled graph lattice must cover live
    traffic (no mid-serving compiles) without touching device state."""

    def _engine(self, tiny_params, prefix=True):
        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                          use_pallas=False, enable_prefix_cache=prefix)

    def test_warmup_covers_traffic_buckets(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        sched = ContinuousBatchingScheduler(
            eng, max_batch=4, max_context=128, scan_steps=4, spec_topk=4,
        )
        rep = sched.warmup(sampled=True, draft_supports=(None, 4), max_draft=16)
        assert rep["graphs"] > 0
        # staggered traffic: varied prompt lengths, a drafted escalation
        # (greedy + stochastic), sampled lanes — every realizable bucket kind
        rng = np.random.default_rng(0)
        reqs = [
            sched.submit([int(x) for x in rng.integers(1, 100, 1 + 7 * i)],
                         max_new=5, temperature=0.5 * (i % 2))
            for i in range(5)
        ]
        sched.run_until_idle()
        donor = sched.submit([5, 6, 7], max_new=6, temperature=0.7)
        sched.run_until_idle()
        drafted = sched.submit(
            [5, 6, 7], max_new=6, draft=donor.out_tokens,
            draft_q=(np.asarray(donor.out_logprobs, np.float32),
                     np.stack(donor.out_topk_ids),
                     np.stack(donor.out_topk_probs)),
            temperature=0.7,
        )
        greedy_draft = sched.submit([9, 9, 1], max_new=6,
                                    draft=[1, 2, 3, 4])
        sched.run_until_idle()
        assert all(r.done and not r.error for r in reqs + [drafted, greedy_draft])
        cold = set(sched._buckets) - sched._warm_buckets
        assert not cold, f"traffic hit unwarmed graph buckets: {cold}"

    def test_warmup_covers_swap_buckets(self, tiny_params):
        """In swap mode the warmup lattice precompiles the gather/scatter
        graphs, so a first preemption pays no mid-serving compile."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=4,
                         use_pallas=False)
        sched = ContinuousBatchingScheduler(
            eng, max_batch=2, max_context=128, preemption_mode="swap",
        )
        sched.warmup(max_draft=8)
        a = sched.submit([3, 14, 15, 9, 2, 6], max_new=30)
        b = sched.submit([7, 8, 9, 1], max_new=30)
        sched.run_until_idle()
        assert a.done and b.done and not a.error and not b.error
        assert sched.swap_preemptions >= 1
        cold = set(sched._buckets) - sched._warm_buckets
        assert not cold, f"swap traffic hit unwarmed graph buckets: {cold}"

    def test_warmup_leaves_generation_identical(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        baseline = [o.token_ids.tolist()
                    for o in eng.generate([[3, 1, 4], [1, 5, 9, 2]], max_new=6)]
        sched = ContinuousBatchingScheduler(eng, max_batch=4, max_context=128,
                                            scan_steps=4)
        sched.warmup(max_draft=8)
        a = sched.submit([3, 1, 4], max_new=6)
        b = sched.submit([1, 5, 9, 2], max_new=6)
        sched.run_until_idle()
        assert a.out_tokens == baseline[0]
        assert b.out_tokens == baseline[1]
        # warmup's dummy pages were all out-of-range: nothing leaked
        assert eng.allocator.stats().active_requests == 0

    def test_warmup_no_prefix_cache_path(self, tiny_params):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params, prefix=False)
        sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=64)
        sched.warmup(max_draft=8)
        r = sched.submit([2, 7, 1, 8], max_new=4)
        sched.run_until_idle()
        assert r.done and not r.error
        assert not set(sched._buckets) - sched._warm_buckets

    def test_scheduled_pipeline_warmup(self, tiny_params):
        """Cascade-level warmup covers admissions AND cross-tier escalation
        verifies on the upper tiers."""
        from adaptive_sd_tpu.cascade import (
            EngineTextStage,
            PipelineConfig,
            ScheduledCascadePipeline,
            StageManager,
        )
        from adaptive_sd_tpu.core.types import RequestContext

        def tok(t):
            return [(ord(c) % 100) + 1 for c in t] or [1]

        def detok(ids):
            return " ".join(str(int(i)) for i in ids)

        stages = [
            EngineTextStage(self._engine(tiny_params), tok, detok,
                            name=f"t{i}", stage_index=i)
            for i in range(2)
        ]

        class P:
            def predict(self, prompt, draft, lps, k):
                from adaptive_sd_tpu.core.types import PredictionResult
                # low tier-0 score forces escalation; tier 1 stops
                return PredictionResult(quality_score=0.05 if k == 0 else 0.95,
                                        confidence=1.0)

        pipe = ScheduledCascadePipeline(
            StageManager(stages), P(),
            # lam ~ 0: quality-dominant, so the 0.05 tier-0 score must
            # escalate even through the zero-observation Bayesian blend
            PipelineConfig(lam=0.05, enable_caching=False,
                           prompt_conditional_priors=False),
            costs=[1.0, 2.0], max_batch=2, max_context=128, scan_steps=4,
        )
        try:
            rep = pipe.warmup(max_draft=8)
            assert set(rep) == {"t0", "t1"}
            res = pipe.process_request(
                RequestContext(prompt="warm me", max_tokens=6,
                               request_id="w0"), timeout=120,
            )
            assert res.error is None and res.final_stage == 1
            for sc in pipe.schedulers:
                cold = set(sc._buckets) - sc._warm_buckets
                assert not cold, f"cold buckets after pipeline warmup: {cold}"
        finally:
            pipe.shutdown()


class TestDeviceCarryScan:
    """Device-carry scan dispatch (engine/scheduler.py device_carry): the
    carried rounds must reproduce the legacy re-upload path exactly, and
    the self-healing mirror must survive admissions/retires mid-stream."""

    def _engine(self, tiny_params, eos=None):
        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                          use_pallas=False, eos_id=eos)

    def _run(self, tiny_params, device_carry, scan_steps=4):
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        sched = ContinuousBatchingScheduler(
            eng, max_batch=2, max_context=64, scan_steps=scan_steps,
            device_carry=device_carry,
        )
        # more requests than lanes: retires + re-admissions churn the lane
        # set while scans run, exercising the diff/patch path
        reqs = [sched.submit([i + 1, i + 2, i + 3], max_new=6)
                for i in range(5)]
        sched.run_until_idle()
        assert all(r.done and not r.error for r in reqs)
        return [r.out_tokens for r in reqs], sched

    def test_carry_matches_legacy_path(self, tiny_params):
        toks_carry, sc = self._run(tiny_params, device_carry=True)
        toks_plain, sp = self._run(tiny_params, device_carry=False)
        assert toks_carry == toks_plain
        st = sc.stats()["carry"]
        assert st["enabled"] and st["rounds"] > 0
        assert sp.stats()["carry"]["rounds"] == 0

    def test_carry_matches_fused(self, tiny_params):
        eng = self._engine(tiny_params)
        fused = [o.token_ids.tolist()
                 for o in eng.generate([[3, 14, 15], [9, 2, 6, 5]], max_new=8)]
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        sched = ContinuousBatchingScheduler(
            eng, max_batch=4, max_context=128, scan_steps=4, device_carry=True
        )
        a = sched.submit([3, 14, 15], max_new=8)
        b = sched.submit([9, 2, 6, 5], max_new=8)
        sched.run_until_idle()
        assert a.out_tokens == fused[0]
        assert b.out_tokens == fused[1]

    def test_carry_eos_and_mixed_budgets(self, tiny_params):
        """eos mid-scan zeroes the device budget; the mirror must agree
        (no spurious patches that would re-activate the lane)."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        eng = self._engine(tiny_params)
        probe = eng.generate([[5, 6, 7]], max_new=12)[0].token_ids.tolist()
        eos = probe[3]  # force an eos hit partway through
        eng2 = self._engine(tiny_params, eos=eos)
        expected = eng2.generate([[5, 6, 7], [1, 2]], max_new=12)
        sched = ContinuousBatchingScheduler(
            eng2, max_batch=2, max_context=64, scan_steps=5, device_carry=True
        )
        a = sched.submit([5, 6, 7], max_new=12)
        b = sched.submit([1, 2], max_new=3)  # mixed budget
        sched.run_until_idle()
        assert a.out_tokens == expected[0].token_ids.tolist()
        assert len(b.out_tokens) == 3
