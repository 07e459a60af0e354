"""Windowed paged attention + chunked prefill: the op under prefix caching,
chunked long-prompt prefill, and the split verify pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.engine import PagedKVCache
from adaptive_sd_tpu.models import TINY, init_params
from adaptive_sd_tpu.models.qwen import (
    decode_step,
    logits_at,
    prefill,
    prefill_window,
)
from adaptive_sd_tpu.ops.attention import (
    paged_attention_ref,
    paged_window_attention,
    paged_window_attention_ref,
)

PAGE = 16


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, jax.random.key(0), dtype=jnp.float32)


def _random_cache(rng, n_kv, n_pages, D):
    k_pages = jnp.asarray(rng.integers(-127, 128, (n_kv, n_pages, PAGE, D)), jnp.int8)
    k_scales = jnp.asarray(rng.uniform(0.001, 0.02, (n_kv, n_pages, 1, PAGE)), jnp.float32)
    v_pages = jnp.asarray(rng.integers(-127, 128, (n_kv, n_pages, PAGE, D)), jnp.int8)
    v_scales = jnp.asarray(rng.uniform(0.001, 0.02, (n_kv, n_pages, 1, PAGE)), jnp.float32)
    return k_pages, k_scales, v_pages, v_scales


class TestWindowAttentionOp:
    def test_kernel_matches_ref(self):
        rng = np.random.default_rng(0)
        B, n_kv, G, D, W = 2, 2, 2, 64, 5
        kp, ks, vp, vs = _random_cache(rng, n_kv, n_pages=6, D=D)
        q = jnp.asarray(rng.normal(0, 1, (B, n_kv, W * G, D)), jnp.float32)
        tables = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        offsets = jnp.asarray([7, 18], jnp.int32)
        ctx = offsets + W
        ref = paged_window_attention_ref(
            q, kp, ks, vp, vs, tables, ctx, offsets, group=G, sm_scale=0.125
        )
        out = paged_window_attention(
            q, kp, ks, vp, vs, tables, ctx, offsets, group=G, sm_scale=0.125,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_single_position_window_equals_decode_attention(self):
        """A W=1 window at position p must equal decode attention with
        seq_len = p + 1."""
        rng = np.random.default_rng(1)
        B, n_kv, G, D = 2, 2, 2, 64
        kp, ks, vp, vs = _random_cache(rng, n_kv, n_pages=4, D=D)
        q = jnp.asarray(rng.normal(0, 1, (B, n_kv, G, D)), jnp.float32)
        tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
        pos = jnp.asarray([9, 21], jnp.int32)
        dec = paged_attention_ref(
            q, kp, ks, vp, vs, tables, pos + 1, sm_scale=0.125
        )
        win = paged_window_attention_ref(
            q, kp, ks, vp, vs, tables, pos + 1, pos, group=G, sm_scale=0.125
        )
        np.testing.assert_allclose(np.asarray(win), np.asarray(dec), atol=1e-6)

    def test_causality_within_window(self):
        """Changing KV at positions AFTER a query row must not change it."""
        rng = np.random.default_rng(2)
        B, n_kv, G, D, W = 1, 1, 1, 64, 4
        kp, ks, vp, vs = _random_cache(rng, n_kv, n_pages=2, D=D)
        q = jnp.asarray(rng.normal(0, 1, (B, n_kv, W * G, D)), jnp.float32)
        tables = jnp.asarray([[0, 1]], jnp.int32)
        off = jnp.asarray([3], jnp.int32)
        base = paged_window_attention_ref(
            q, kp, ks, vp, vs, tables, off + W, off, group=G, sm_scale=0.125
        )
        # perturb KV at the LAST window position (global pos off+W-1 = 6)
        kp2 = kp.at[:, 0, 6].set(127)
        out = paged_window_attention_ref(
            q, kp2, ks, vp, vs, tables, off + W, off, group=G, sm_scale=0.125
        )
        # rows 0..W-2 unchanged; row W-1 changed
        np.testing.assert_allclose(
            np.asarray(out[:, :, : W - 1]), np.asarray(base[:, :, : W - 1]), atol=1e-6
        )
        assert not np.allclose(np.asarray(out[:, :, W - 1]), np.asarray(base[:, :, W - 1]))


class TestChunkedPrefill:
    def test_chunked_equals_full_prefill(self, tiny_params):
        """prefill(chunk0) + prefill_window(chunk1..) must reproduce the full
        prefill's last-token logits and subsequent greedy decode (within INT8
        KV tolerance: the window path attends its own chunk through the
        quantized pages, full prefill attends raw f32)."""
        B, S, C = 2, 24, PAGE  # chunk = one page
        rng = np.random.default_rng(3)
        toks = jnp.asarray(rng.integers(1, TINY.vocab_size, (B, S)), jnp.int32)
        seq_lens = jnp.asarray([S, S - 5], jnp.int32)
        tables = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)

        cache_full = PagedKVCache.create(TINY, n_pages=8, page_size=PAGE)
        logits_full, cache_full = prefill(
            tiny_params, TINY, toks, seq_lens, cache_full, tables, use_pallas=False
        )

        cache = PagedKVCache.create(TINY, n_pages=8, page_size=PAGE)
        # chunk 0 via plain prefill (lengths clamped to C)
        l0 = jnp.minimum(seq_lens, C)
        _, cache = prefill(
            tiny_params, TINY, toks[:, :C], l0, cache, tables, use_pallas=False
        )
        # chunk 1 via the window path
        w_lens = seq_lens - l0
        h, cache = prefill_window(
            tiny_params, TINY, toks[:, C:], jnp.full((B,), C, jnp.int32), w_lens,
            cache, tables, use_pallas=False,
        )
        # last valid hidden per row -> logits
        last = jnp.take_along_axis(
            h, jnp.maximum(w_lens - 1, 0)[:, None, None], axis=1
        )[:, 0]
        logits_chunked = logits_at(tiny_params, TINY, last[:, None], use_pallas=False)[:, 0]

        assert (
            jnp.argmax(logits_chunked, -1) == jnp.argmax(logits_full, -1)
        ).all()
        np.testing.assert_allclose(
            np.asarray(logits_chunked), np.asarray(logits_full), rtol=0.1, atol=0.08
        )

        # the caches must agree too: decode one step from each
        nxt = jnp.argmax(logits_full, -1).astype(jnp.int32)
        d_full, _ = decode_step(
            tiny_params, TINY, nxt, seq_lens, cache_full, tables, use_pallas=False
        )
        d_chunk, _ = decode_step(
            tiny_params, TINY, nxt, seq_lens, cache, tables, use_pallas=False
        )
        assert (jnp.argmax(d_full, -1) == jnp.argmax(d_chunk, -1)).all()
        np.testing.assert_allclose(
            np.asarray(d_chunk), np.asarray(d_full), rtol=0.1, atol=0.08
        )

    def test_window_kernel_path_matches_ref_path(self, tiny_params):
        """prefill_window with the Pallas kernel (interpret) equals the jnp
        reference path exactly."""
        import adaptive_sd_tpu.ops.attention as attn_mod

        B, C, W = 1, PAGE, 6
        rng = np.random.default_rng(4)
        toks = jnp.asarray(rng.integers(1, TINY.vocab_size, (B, C + W)), jnp.int32)
        tables = jnp.asarray([[0, 1, 2]], jnp.int32)

        def run(use_kernel):
            cache = PagedKVCache.create(TINY, n_pages=4, page_size=PAGE)
            _, cache = prefill(
                tiny_params, TINY, toks[:, :C], jnp.asarray([C], jnp.int32),
                cache, tables, use_pallas=False,
            )
            if use_kernel:
                orig = attn_mod.paged_window_attention
                import functools

                patched = functools.partial(orig, interpret=True)
                attn_mod_backup = None
                # route prefill_window's use_pallas=True through interpret mode
                import adaptive_sd_tpu.models.qwen as qwen_mod

                try:
                    attn_mod.paged_window_attention = patched
                    h, cache = prefill_window(
                        tiny_params, TINY, toks[:, C:], jnp.asarray([C], jnp.int32),
                        jnp.asarray([W], jnp.int32), cache, tables, use_pallas=True,
                    )
                finally:
                    attn_mod.paged_window_attention = orig
            else:
                h, cache = prefill_window(
                    tiny_params, TINY, toks[:, C:], jnp.asarray([C], jnp.int32),
                    jnp.asarray([W], jnp.int32), cache, tables, use_pallas=False,
                )
            return np.asarray(h)

        ref = run(False)
        ker = run(True)
        np.testing.assert_allclose(ker, ref, atol=2e-4)


class TestPrefixCache:
    """Content-addressed KV-page prefix caching (engine/prefix_cache.py) and
    its TierEngine integration."""

    def _engine(self, tiny_params, **kw):
        from adaptive_sd_tpu.engine import TierEngine

        return TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                          use_pallas=False, enable_prefix_cache=True, **kw)

    def test_unit_acquire_release(self):
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        alloc = PageAllocator(16)
        pc = PrefixCache(alloc, page_size=4)
        prompt = list(range(1, 11))  # 10 tokens -> 2 full chunks
        pages, n, held, fill = pc.acquire(prompt)
        assert n == 0 and len(pages) == 2 and len(fill) == 2
        pc.release(held)
        # second acquire: full hit on both chunks, same pages
        pages2, n2, held2, fill2 = pc.acquire(prompt)
        assert n2 == 8 and pages2 == pages and not fill2
        # a diverging prompt hits chunk 0 only
        other = prompt[:4] + [99] * 6
        pages3, n3, _h3, fill3 = pc.acquire(other)
        assert n3 == 4 and pages3[0] == pages[0] and len(fill3) == 1
        st = pc.stats()
        assert st["hits"] == 3 and st["entries"] == 3

    def test_exact_page_multiple_keeps_one_token(self):
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        alloc = PageAllocator(16)
        pc = PrefixCache(alloc, page_size=4)
        prompt = list(range(1, 9))  # exactly 2 pages
        pages, n, held, _ = pc.acquire(prompt)
        pc.release(held)
        _, n2, held2, _ = pc.acquire(prompt)
        pc.release(held2)
        # only 1 chunk cacheable: the last token must stay for logits
        assert n2 == 4

    def test_eviction_frees_pages(self):
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        alloc = PageAllocator(4)
        pc = PrefixCache(alloc, page_size=2, max_pages=2)
        for i in range(4):
            prompt = [10 + i, 20 + i, 30 + i]  # 1 full chunk each, distinct
            _, _, held, _ = pc.acquire(prompt)
            pc.release(held)
        assert pc.stats()["entries"] <= 2
        assert pc.evictions >= 2
        assert alloc.stats().free_pages >= 2

    def test_engine_cached_matches_plain(self, tiny_params):
        from adaptive_sd_tpu.engine import TierEngine

        plain = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                           use_pallas=False)
        cached = self._engine(tiny_params)
        prompts = [list(range(1, PAGE + 7)), [5, 9, 13]]
        ref = plain.generate(prompts, max_new=6)
        out1 = cached.generate(prompts, max_new=6)   # cold: fills the cache
        out2 = cached.generate(prompts, max_new=6)   # warm: reuses prefix
        for r, o1, o2 in zip(ref, out1, out2):
            assert o1.token_ids.tolist() == r.token_ids.tolist()
            assert o2.token_ids.tolist() == r.token_ids.tolist()
        st = cached.prefix_cache.stats()
        assert st["hits"] >= 1
        assert st["held_refs"] == 0
        # request-owned pages reclaimed; only cache-owned pages outstanding
        assert cached.allocator.stats().active_requests == st["entries"]

    def test_shared_prefix_across_requests(self, tiny_params):
        """Different prompts sharing a long common prefix share its pages."""
        cached = self._engine(tiny_params)
        common = list(range(1, 2 * PAGE + 1))
        a = cached.generate([common + [7, 8]], max_new=4)[0]
        free_before = cached.allocator.stats().free_pages
        b = cached.generate([common + [9, 10, 11]], max_new=4)[0]
        assert cached.prefix_cache.stats()["hits"] >= 2
        assert a.num_tokens == 4 and b.num_tokens == 4

    def test_unit_spill_and_restore(self):
        """Evicted pages spill to host (budgeted LRU) and a chain-intact
        re-acquire restores them as hits instead of misses."""
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        device = {}  # page -> content; stands in for the KV pools

        def swap_out(pages):
            import numpy as np
            return (np.asarray([device.get(p, 0) for p in pages]),)

        def swap_in(pages, blob):
            for p, v in zip(pages, blob[0]):
                device[p] = int(v)

        alloc = PageAllocator(16)
        pc = PrefixCache(alloc, page_size=4, spill_bytes=1 << 20,
                         swap_out=swap_out, swap_in=swap_in)
        prompt = list(range(1, 11))  # 2 full chunks
        pages, _, held, fill = pc.acquire(prompt)
        for p in pages:
            device[p] = 100 + p  # "prefill" writes content
        pc.release(held)
        while pc.evict_one():
            pass
        assert pc.stats()["spills"] == 2 and pc.stats()["entries"] == 0
        saved = {p: device[p] for p in pages}
        for p in pages:
            device[p] = -1  # clobber freed pages
        pages2, n2, held2, fill2 = pc.acquire(prompt)
        assert n2 == 8 and not fill2          # full reuse, no recompute
        assert pc.stats()["spill_hits"] == 2
        assert [device[p] for p in pages2] == [saved[p] for p in pages]
        pc.release(held2)

    def test_unit_spill_restore_failure_leaks_nothing(self):
        """A non-ResourceError from the device swap-in during a spill-hit
        restore must free the just-allocated page, re-shelve the blob, and
        unwind earlier refs of the same acquire — no permanent page leak
        (advisor r3): the retry after the fault succeeds with full reuse."""
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        import numpy as np

        device = {}
        fail = {"on": False}

        def swap_out(pages):
            return (np.asarray([device.get(p, 0) for p in pages]),)

        def swap_in(pages, blob):
            if fail["on"]:
                raise RuntimeError("injected device fault")
            for p, v in zip(pages, blob[0]):
                device[p] = int(v)

        alloc = PageAllocator(16)
        pc = PrefixCache(alloc, page_size=4, spill_bytes=1 << 20,
                         swap_out=swap_out, swap_in=swap_in)
        prompt = list(range(1, 11))  # 2 full chunks
        pages, _, held, _ = pc.acquire(prompt)
        for p in pages:
            device[p] = 100 + p
        pc.release(held)
        while pc.evict_one():
            pass
        assert pc.stats()["spilled_entries"] == 2
        fail["on"] = True
        try:
            pc.acquire(prompt)
            raise AssertionError("expected injected fault to propagate")
        except RuntimeError:
            pass
        # nothing held, nothing allocated, blobs back on the shelf
        assert pc.stats()["held_refs"] == 0
        assert alloc.stats().free_pages == 16
        assert pc.stats()["spilled_entries"] == 2
        fail["on"] = False
        pages2, n2, held2, fill2 = pc.acquire(prompt)
        assert n2 == 8 and not fill2
        pc.release(held2)

    def test_unit_spill_budget_is_lru_bounded(self):
        from adaptive_sd_tpu.engine.allocator import PageAllocator
        from adaptive_sd_tpu.engine.prefix_cache import PrefixCache

        def swap_out(pages):
            import numpy as np
            return (np.zeros(len(pages), np.int64),)  # 8 bytes/page

        alloc = PageAllocator(16)
        pc = PrefixCache(alloc, page_size=2, spill_bytes=16,
                         swap_out=swap_out, swap_in=lambda p, b: None)
        for i in range(4):
            _, _, held, _ = pc.acquire([50 + i, 60 + i, 70 + i])
            pc.release(held)
        while pc.evict_one():
            pass
        st = pc.stats()
        assert st["spills"] == 4
        assert st["spilled_entries"] == 2      # 16-byte budget, 8 bytes each
        assert st["spilled_bytes"] <= 16

    def test_engine_spill_restores_identical_generation(self, tiny_params):
        """With spill on, full eviction + re-generate gives identical output
        and counts spill hits (no prefill recompute of the prefix)."""
        cached = self._engine(tiny_params, prefix_spill_bytes=64 << 20)
        prompt = list(range(1, 2 * PAGE + 5))  # 2 cacheable chunks
        first = cached.generate([prompt], max_new=8)[0]
        while cached.prefix_cache.evict_one():
            pass
        assert cached.prefix_cache.stats()["spills"] >= 2
        again = cached.generate([prompt], max_new=8)[0]
        assert again.token_ids.tolist() == first.token_ids.tolist()
        st = cached.prefix_cache.stats()
        assert st["spill_hits"] >= 2
        assert st["held_refs"] == 0

    def test_long_prompt_page_hygiene(self, tiny_params):
        """Decode writes must stay in request-owned pages (never corrupt a
        shared prefix page): generating twice from the same prefix must give
        identical outputs even after interleaved other traffic."""
        cached = self._engine(tiny_params)
        prompt = list(range(1, 3 * PAGE + 5))
        first = cached.generate([prompt], max_new=8)[0]
        cached.generate([[9, 8, 7]], max_new=8)  # unrelated traffic
        again = cached.generate([prompt], max_new=8)[0]
        assert first.token_ids.tolist() == again.token_ids.tolist()


class TestPrefixCachedVerify:
    """verify_continue through the window path: with a prefix cache the
    escalated prompt's cached pages are skipped — the verify pass covers
    only [uncached prompt suffix + draft]."""

    def test_matches_plain_verify(self, tiny_params):
        from adaptive_sd_tpu.engine import TierEngine

        plain = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                           use_pallas=False)
        cached = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                            use_pallas=False, enable_prefix_cache=True)
        prompt = list(range(1, 2 * PAGE + 6))
        full = plain.generate([prompt], max_new=8)[0]
        draft = full.token_ids[:5].tolist()
        draft[4] = (draft[4] + 3) % TINY.vocab_size or 1  # corrupt 5th

        ref_out, ref_acc = plain.verify_continue([prompt], [draft], max_new=8)[0]
        # cold (fills prompt chunks), then warm (reuses them)
        o1, a1 = cached.verify_continue([prompt], [draft], max_new=8)[0]
        o2, a2 = cached.verify_continue([prompt], [draft], max_new=8)[0]
        assert a1 == ref_acc == a2 == 4
        assert o1.token_ids.tolist() == ref_out.token_ids.tolist()
        assert o2.token_ids.tolist() == ref_out.token_ids.tolist()
        assert cached.prefix_cache.stats()["hits"] >= 2
        assert cached.allocator.stats().active_requests == \
            cached.prefix_cache.stats()["entries"]

    def test_generate_then_verify_shares_prefix(self, tiny_params):
        """The cascade pattern: tier generates (fills prefix), then verify
        of an escalated request with the same prompt prefix reuses it."""
        from adaptive_sd_tpu.engine import TierEngine

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False, enable_prefix_cache=True)
        prompt = list(range(1, 2 * PAGE + 3))
        d = eng.generate([prompt], max_new=6)[0]
        hits0 = eng.prefix_cache.stats()["hits"]
        out, n_acc = eng.verify_continue([prompt], [d.token_ids.tolist()], max_new=6)[0]
        assert eng.prefix_cache.stats()["hits"] > hits0
        assert n_acc == 6  # self-draft fully accepted
        assert out.token_ids.tolist() == d.token_ids.tolist()

    def test_stochastic_cached_verify(self, tiny_params):
        from adaptive_sd_tpu.engine import TierEngine

        eng = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                         use_pallas=False, enable_prefix_cache=True)
        prompt = list(range(1, 2 * PAGE + 3))
        K = min(32, TINY.vocab_size)
        d = eng.generate([prompt], max_new=6, temperature=1.0, seed=3,
                         return_topk=K)[0]
        out, n_acc = eng.verify_continue(
            [prompt], [d.token_ids.tolist()], max_new=6, temperature=1.0,
            seed=5, draft_q=[(d.logprobs, d.topk_ids, d.topk_probs)],
        )[0]
        assert 0 <= n_acc <= 6
        assert out.token_ids[:n_acc].tolist() == d.token_ids[:n_acc].tolist()
        assert out.num_tokens == 6


class TestPrefixCacheTP:
    """Prefix caching on the shard_map tensor-parallel path (VERDICT r1 #6):
    qwen_tp's prefill_window runs the suffix-window pass per shard (one psum
    per sublayer) over head-sharded KV pages — outputs must be exact vs the
    single-device engine, cold and warm."""

    def _mesh(self, tp=2):
        from jax.sharding import Mesh
        from adaptive_sd_tpu.parallel.mesh import AXIS_DP, AXIS_TP

        devs = np.asarray(jax.devices()[: tp]).reshape(1, tp)
        return Mesh(devs, (AXIS_DP, AXIS_TP))

    def _engines(self, tiny_params):
        from adaptive_sd_tpu.engine import TierEngine

        plain = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                           use_pallas=False)
        tp_cached = TierEngine(TINY, tiny_params, page_size=PAGE, n_pages=128,
                               use_pallas=False, enable_prefix_cache=True,
                               mesh=self._mesh())
        assert tp_cached.tp_mode, "TINY must take the shard_map TP path"
        assert tp_cached.prefix_cache is not None
        return plain, tp_cached

    def test_tp_cached_generate_matches_single_device(self, tiny_params):
        plain, tp_cached = self._engines(tiny_params)
        prompts = [list(range(1, 2 * PAGE + 7)), [5, 9, 13]]
        ref = plain.generate(prompts, max_new=6)
        out1 = tp_cached.generate(prompts, max_new=6)   # cold: fills cache
        out2 = tp_cached.generate(prompts, max_new=6)   # warm: reuses prefix
        for r, o1, o2 in zip(ref, out1, out2):
            assert o1.token_ids.tolist() == r.token_ids.tolist()
            assert o2.token_ids.tolist() == r.token_ids.tolist()
        assert tp_cached.prefix_cache.stats()["hits"] >= 2

    def test_tp_cached_verify_matches_single_device(self, tiny_params):
        plain, tp_cached = self._engines(tiny_params)
        prompt = list(range(1, 2 * PAGE + 6))
        full = plain.generate([prompt], max_new=8)[0]
        draft = full.token_ids[:5].tolist()
        draft[4] = (draft[4] + 3) % TINY.vocab_size or 1

        ref_out, ref_acc = plain.verify_continue([prompt], [draft], max_new=8)[0]
        o1, a1 = tp_cached.verify_continue([prompt], [draft], max_new=8)[0]
        o2, a2 = tp_cached.verify_continue([prompt], [draft], max_new=8)[0]
        assert a1 == ref_acc == a2
        assert o1.token_ids.tolist() == ref_out.token_ids.tolist()
        assert o2.token_ids.tolist() == ref_out.token_ids.tolist()
        assert tp_cached.prefix_cache.stats()["hits"] >= 1
