"""shard_map tensor-parallel forward: exact equivalence with the
single-device path on the 8-device CPU mesh (bf16-free f32 numerics so the
comparison is tight). Covers bf16/int8/int4 layouts, the fused-projection
interleave, the int4 row repack, and the TierEngine TP integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from adaptive_sd_tpu.engine import PagedKVCache, TierEngine
from adaptive_sd_tpu.models import TINY, init_params, quantize_model
from adaptive_sd_tpu.models.qwen import fuse_projections, prefill, decode_step
from adaptive_sd_tpu.models.qwen_tp import (
    local_spec,
    make_tp_forward,
    prepare_tp_params,
    shard_cache_tp,
    tp_compatible,
    transform_params_for_tp,
)
from adaptive_sd_tpu.parallel.mesh import AXIS_DP, AXIS_TP

PAGE = 16


def tp_mesh(tp, dp=1):
    devs = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, (AXIS_DP, AXIS_TP))


@pytest.fixture(scope="module")
def params_f32():
    return init_params(TINY, jax.random.key(0), dtype=jnp.float32)


def _ref_outputs(params, toks, seq_lens, tables, n_pages=32):
    cache = PagedKVCache.create(TINY, n_pages, PAGE)
    logits, cache, h = prefill(
        params, TINY, toks, seq_lens, cache, tables,
        use_pallas=False, return_hidden=True,
    )
    # one decode step after the prompt
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits2, cache = decode_step(
        params, TINY, nxt, seq_lens, cache, tables, use_pallas=False
    )
    return logits, h, logits2


def _tp_outputs(params, toks, seq_lens, tables, tp, n_pages=32):
    mesh = tp_mesh(tp)
    tparams = prepare_tp_params(params, TINY, mesh)
    cache = shard_cache_tp(PagedKVCache.create(TINY, n_pages, PAGE), mesh)
    fwd = make_tp_forward(TINY, mesh, use_pallas=False)
    logits, cache, h = fwd.prefill(
        tparams, TINY, toks, seq_lens, cache, tables, return_hidden=True
    )
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits2, cache = fwd.decode_step(tparams, TINY, nxt, seq_lens, cache, tables)
    return logits, h, logits2


def _case(params, tp, atol):
    rng = np.random.default_rng(0)
    B, S = 2, 11
    toks = jnp.asarray(rng.integers(1, TINY.vocab_size, (B, S)), jnp.int32)
    seq_lens = jnp.asarray([S, S - 3], jnp.int32)
    tables = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    ref_l, ref_h, ref_l2 = _ref_outputs(params, toks, seq_lens, tables)
    tp_l, tp_h, tp_l2 = _tp_outputs(params, toks, seq_lens, tables, tp)
    np.testing.assert_allclose(np.asarray(tp_l), np.asarray(ref_l), atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(tp_h), np.asarray(ref_h), atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(tp_l2), np.asarray(ref_l2), atol=atol, rtol=0)


class TestTPEquivalence:
    @pytest.mark.parametrize("tp", [2])
    def test_raw_f32(self, params_f32, tp):
        _case(params_f32, tp, atol=2e-4)

    def test_int8_unfused(self, params_f32):
        _case(quantize_model(params_f32, bits=8), tp=2, atol=2e-4)

    def test_int8_fused_interleave(self, params_f32):
        _case(quantize_model(fuse_projections(params_f32), bits=8), tp=2, atol=2e-4)

    def test_int4_row_repack(self, params_f32):
        # per-channel int4 (TINY dims aren't 128-divisible for groups)
        _case(quantize_model(params_f32, bits=4, group_size=None), tp=2, atol=2e-4)

    def test_int4_grouped(self, params_f32):
        # group size dividing both ffn=128 and hidden=64 local K... use 32
        _case(quantize_model(params_f32, bits=4, group_size=32), tp=2, atol=2e-4)

    def test_transform_is_pure_relayout(self, params_f32):
        """Interleave+repack must be numerically exact: dequantizing the
        transformed fused weight and undoing the permutation recovers the
        original."""
        from adaptive_sd_tpu.ops import dequantize

        qp = quantize_model(fuse_projections(params_f32), bits=8)
        tp = 2
        tqp = transform_params_for_tp(qp, TINY, tp)
        w0 = dequantize(qp["layers"][0]["qkv_proj"])
        w1 = dequantize(tqp["layers"][0]["qkv_proj"])
        from adaptive_sd_tpu.models.qwen_tp import _fused_perm

        D = TINY.head_dim
        perm = _fused_perm(
            (TINY.n_heads * D, TINY.n_kv_heads * D, TINY.n_kv_heads * D), tp
        )
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w0)[:, perm])

    def test_tp_compatible_gate(self, params_f32):
        assert tp_compatible(TINY, params_f32, 2)
        assert not tp_compatible(TINY, params_f32, 1)
        # kv heads = 2 -> tp=4 unsupported
        assert not tp_compatible(TINY, params_f32, 4)

    def test_local_spec(self):
        ls = local_spec(TINY, 2)
        assert ls.n_heads == 2 and ls.n_kv_heads == 1 and ls.ffn == 64
        assert ls.vocab_size == TINY.vocab_size
        assert ls.q_group == TINY.q_group


class TestTierEngineTP:
    def test_generate_matches_single_device(self, params_f32):
        qp = quantize_model(fuse_projections(params_f32), bits=8)
        eng1 = TierEngine(TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False)
        eng2 = TierEngine(
            TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False, mesh=tp_mesh(2)
        )
        assert eng2.tp_mode
        prompts = [[5, 9, 13], [7, 2, 21, 4]]
        o1 = eng1.generate(prompts, max_new=6)
        o2 = eng2.generate(prompts, max_new=6)
        for a, b in zip(o1, o2):
            assert a.token_ids.tolist() == b.token_ids.tolist()
            np.testing.assert_allclose(a.logprobs, b.logprobs, atol=1e-4)

    def test_verify_continue_tp(self, params_f32):
        qp = quantize_model(fuse_projections(params_f32), bits=8)
        eng = TierEngine(
            TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False, mesh=tp_mesh(2)
        )
        prompt = [5, 9, 13]
        full = eng.generate([prompt], max_new=8)[0]
        draft = full.token_ids[:4].tolist()
        out, n_acc = eng.verify_continue([prompt], [draft], max_new=8)[0]
        assert n_acc == 4
        assert out.token_ids.tolist() == full.token_ids.tolist()

    def test_scheduler_lanes_over_tp_engine(self, params_f32):
        """Continuous-batching lane paths (plain + draft admission + decode
        scan) run over the shard_map tensor-parallel forward and match the
        single-device engine's greedy outputs."""
        from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler

        qp = quantize_model(fuse_projections(params_f32), bits=8)
        eng1 = TierEngine(TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False)
        eng = TierEngine(
            TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False, mesh=tp_mesh(2)
        )
        assert eng.tp_mode
        prompt = [5, 9, 13]
        ref = eng1.generate([prompt], max_new=8)[0].token_ids.tolist()
        sched = ContinuousBatchingScheduler(
            eng, max_batch=2, max_context=64, scan_steps=3
        )
        r_plain = sched.submit(prompt, max_new=8)
        bad = list(ref)
        bad[2] = (bad[2] + 1) % (TINY.vocab_size - 1) + 1
        r_draft = sched.submit(prompt, max_new=8, draft=bad)
        sched.run_until_idle()
        assert r_plain.out_tokens == ref
        assert r_draft.n_accepted == 2
        assert r_draft.out_tokens == ref

    def test_dp_axis_replicates(self, params_f32):
        """A (dp=2, tp=2) mesh: TP path treats dp as replication."""
        qp = quantize_model(params_f32, bits=8)
        eng1 = TierEngine(TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False)
        eng = TierEngine(
            TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False,
            mesh=tp_mesh(2, dp=2),
        )
        assert eng.tp_mode
        out = eng.generate([[5, 9, 13]], max_new=5)[0]
        ref = eng1.generate([[5, 9, 13]], max_new=5)[0]
        assert out.token_ids.tolist() == ref.token_ids.tolist()

    def test_incompatible_spec_falls_back_to_gspmd(self, params_f32):
        """tp=4 doesn't divide TINY's 2 kv heads -> GSPMD fallback, still
        correct."""
        qp = quantize_model(params_f32, bits=8)
        devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
        mesh = Mesh(devs, (AXIS_DP, AXIS_TP))
        eng = TierEngine(TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False, mesh=mesh)
        assert not eng.tp_mode
        eng1 = TierEngine(TINY, qp, page_size=PAGE, n_pages=64, use_pallas=False)
        out = eng.generate([[5, 9, 13]], max_new=5)[0]
        ref = eng1.generate([[5, 9, 13]], max_new=5)[0]
        assert out.token_ids.tolist() == ref.token_ids.tolist()
