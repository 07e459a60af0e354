"""Kernel correctness: quantization round-trips, Pallas kernels vs jnp
references (interpret mode on CPU), sampling, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.ops import (
    greedy_sample,
    logprob_stats,
    pack_int4,
    paged_attention,
    paged_attention_ref,
    prefill_attention,
    quantization_error,
    quantize_int4,
    quantize_int8,
    quantize_kv_int8,
    dequantize_kv_int8,
    quantized_matmul,
    quantized_matmul_ref,
    sample,
    unpack_int4,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestQuant:
    def test_int8_roundtrip_error(self, rng):
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        t = quantize_int8(w)
        assert t.q.dtype == jnp.int8 and t.scale.shape == (128,)
        assert quantization_error(w, t) < 0.02

    def test_int4_pack_unpack_exact(self, rng):
        q = jnp.asarray(rng.integers(-8, 8, size=(64, 32)).astype(np.int8))
        assert jnp.array_equal(unpack_int4(pack_int4(q)), q)

    def test_int4_roundtrip_error(self, rng):
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        t = quantize_int4(w)
        assert t.q.shape == (128, 128)  # packed along K
        assert quantization_error(w, t) < 0.2

    def test_kv_int8(self, rng):
        kv = jnp.asarray(rng.normal(size=(4, 16, 128)).astype(np.float32))
        q, s = quantize_kv_int8(kv)
        back = dequantize_kv_int8(q, s, jnp.float32)
        assert jnp.max(jnp.abs(back - kv)) < 0.05

    def test_odd_k_pack_raises(self):
        with pytest.raises(ValueError):
            pack_int4(jnp.zeros((3, 4), jnp.int8))


class TestQuantizedMatmul:
    @pytest.mark.parametrize("bits", [8, 4])
    @pytest.mark.parametrize("M", [1, 5, 16])
    def test_kernel_matches_reference(self, rng, bits, M):
        K, N = 512, 256
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int8(w) if bits == 8 else quantize_int4(w)
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=bits)
        ker = quantized_matmul(x, t.q, t.scale, bits=bits, interpret=True)
        # atol covers f32 accumulation-order differences (the int4 kernel
        # contracts lo/hi halves as two dots).
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_irregular_dims_fall_back(self, rng):
        w = jnp.asarray(rng.normal(size=(100, 96)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(3, 100)).astype(np.float32))
        t = quantize_int8(w)
        out = quantized_matmul(x, t.q, t.scale, bits=8, interpret=True)
        assert out.shape == (3, 96)

    @pytest.mark.parametrize("bits", [8, 4])
    def test_large_m_blocks_match_reference(self, rng, bits):
        """M > _BM_CAP exercises the M-axis grid blocking (prefill/verify
        shapes): multiple M blocks, padded tail rows, identical math."""
        K, N, M = 512, 256, 1000  # M_pad = 1024 -> two 512-row M blocks
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int8(w) if bits == 8 else quantize_int4(w)
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=bits)
        ker = quantized_matmul(x, t.q, t.scale, bits=bits, interpret=True)
        assert ker.shape == (M, N)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_large_m_grouped_matches_reference(self, rng):
        K, N, M = 512, 256, 600  # M_pad = 1024, ragged final block
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int4(w, group_size=128)
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=4)
        ker = quantized_matmul(x, t.q, t.scale, bits=4, interpret=True)
        assert ker.shape == (M, N)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_large_m_w8a8_matches_float(self, rng):
        from adaptive_sd_tpu.ops.matmul_q import quantized_matmul_w8a8

        K, N, M = 512, 256, 700
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int8(w)
        y = quantized_matmul_w8a8(x, t.q, t.scale, interpret=True)
        assert y.shape == (M, N)
        rel = float(jnp.linalg.norm(y - x @ w) / jnp.linalg.norm(x @ w))
        assert rel < 0.03

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            quantized_matmul(
                jnp.zeros((2, 64)), jnp.zeros((128, 32), jnp.int8), jnp.ones(32), bits=8
            )


class TestPagedAttention:
    def _setup(self, rng, B=2, n_kv=2, G=4, D=128, page=128, max_pages=3):
        n_pages = 8
        q = jnp.asarray(rng.normal(size=(B, n_kv, G, D)).astype(np.float32))
        k = rng.normal(size=(n_kv, n_pages, page, D)).astype(np.float32)
        v = rng.normal(size=(n_kv, n_pages, page, D)).astype(np.float32)
        kq, ks = quantize_kv_int8(jnp.asarray(k))
        vq, vs = quantize_kv_int8(jnp.asarray(v))
        ks = jnp.swapaxes(ks[..., None], 2, 3)  # [n_kv, n_pages, 1, page]
        vs = jnp.swapaxes(vs[..., None], 2, 3)
        tables = jnp.asarray(rng.integers(0, n_pages, size=(B, max_pages)), jnp.int32)
        lens = jnp.asarray([page * max_pages - 17, 40], jnp.int32)[:B]
        return q, kq, ks, vq, vs, tables, lens, D

    def test_kernel_matches_reference(self, rng):
        q, kq, ks, vq, vs, tables, lens, D = self._setup(rng)
        sm = 1.0 / np.sqrt(D)
        ref = paged_attention_ref(q, kq, ks, vq, vs, tables, lens, sm_scale=sm)
        ker = paged_attention(q, kq, ks, vq, vs, tables, lens, sm_scale=sm, interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_length_masking(self, rng):
        """Tokens beyond seq_len must not affect the output."""
        q, kq, ks, vq, vs, tables, lens, D = self._setup(rng, B=1, max_pages=2)
        sm = 1.0 / np.sqrt(D)
        lens = jnp.asarray([5], jnp.int32)
        out1 = paged_attention_ref(q, kq, ks, vq, vs, tables, lens, sm_scale=sm)
        # swap the second page (entirely beyond len 5): output unchanged
        tables2 = tables.at[0, 1].set((tables[0, 1] + 1) % 8)
        out2 = paged_attention_ref(q, kq, ks, vq, vs, tables2, lens, sm_scale=sm)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


class TestPrefillAttention:
    def test_causal_against_naive(self, rng):
        B, S, H, n_kv, D = 2, 16, 4, 2, 32
        q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        out = prefill_attention(q, k, v, sm_scale=1.0 / np.sqrt(D))
        # naive per-position loop
        group = H // n_kv
        for b in range(B):
            for h in range(H):
                kv_h = h // group
                for i in [0, 5, S - 1]:
                    s = (q[b, i, h] @ k[b, : i + 1, kv_h].T) / np.sqrt(D)
                    w = jax.nn.softmax(s)
                    expect = w @ v[b, : i + 1, kv_h]
                    np.testing.assert_allclose(
                        np.asarray(out[b, i, h]), np.asarray(expect), rtol=1e-4, atol=1e-4
                    )

    def test_padding_mask(self, rng):
        B, S, H, n_kv, D = 1, 8, 2, 2, 16
        q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        out1 = prefill_attention(q, k, v, sm_scale=0.25, seq_lens=jnp.asarray([4]))
        k2 = k.at[:, 4:].set(99.0)  # garbage beyond the valid length
        v2 = v.at[:, 4:].set(-99.0)
        out2 = prefill_attention(q, k2, v2, sm_scale=0.25, seq_lens=jnp.asarray([4]))
        np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), rtol=1e-5)


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.0, 5.0, 1.0], [3.0, 0.0, 0.0]])
        r = greedy_sample(logits)
        assert r.token.tolist() == [1, 0]
        assert float(r.logprob[0]) == pytest.approx(
            float(jax.nn.log_softmax(logits[0])[1]), abs=1e-6
        )

    def test_temperature_zero_is_greedy(self):
        logits = jnp.asarray([[0.0, 5.0, 1.0]])
        r = sample(logits, jax.random.key(0), temperature=0.0)
        assert r.token.tolist() == [1]

    def test_top_p_excludes_tail(self):
        logits = jnp.asarray([[10.0, 9.9, -10.0, -10.0]])
        toks = set()
        for i in range(20):
            r = sample(logits, jax.random.key(i), temperature=1.0, top_p=0.9)
            toks.add(int(r.token[0]))
        assert toks <= {0, 1}

    def test_top_p_always_keeps_top_token(self):
        logits = jnp.asarray([[10.0, 0.0]])
        r = sample(logits, jax.random.key(0), temperature=1.0, top_p=0.01)
        assert int(r.token[0]) == 0

    def test_logprob_stats_masking(self):
        lp = jnp.asarray([-1.0, -2.0, -3.0, -99.0])
        s = logprob_stats(lp, jnp.asarray(3))
        assert float(s["mean"]) == pytest.approx(-2.0)
        assert float(s["min"]) == pytest.approx(-3.0)


class TestPrefillFusedVsRef:
    def test_fused_matches_einsum_reference(self, rng):
        from adaptive_sd_tpu.ops.attention import prefill_attention, prefill_attention_ref
        import jax.numpy as jnp

        B, S, H, n_kv, D = 2, 24, 4, 2, 32
        q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, n_kv, D)).astype(np.float32))
        lens = jnp.asarray([S, S - 7])
        out = prefill_attention(q, k, v, sm_scale=0.18, seq_lens=lens)
        ref = prefill_attention_ref(q, k, v, sm_scale=0.18, seq_lens=lens)
        # compare only valid positions (padding rows are don't-care)
        for b, L in enumerate([S, S - 7]):
            np.testing.assert_allclose(
                np.asarray(out[b, :L]), np.asarray(ref[b, :L]), rtol=2e-4, atol=2e-4
            )


class TestW8A8:
    def test_w8a8_matches_reference(self, rng):
        from adaptive_sd_tpu.ops.matmul_q import quantized_matmul_w8a8

        K, N, M = 512, 256, 8
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int8(w)
        y = quantized_matmul_w8a8(x, t.q, t.scale, interpret=True)
        y_true = x @ w
        rel = float(jnp.linalg.norm(y - y_true) / jnp.linalg.norm(y_true))
        assert rel < 0.03  # weight + activation int8 rounding

    def test_w8a8_irregular_fallback(self, rng):
        from adaptive_sd_tpu.ops.matmul_q import quantized_matmul_w8a8

        w = jnp.asarray(rng.normal(size=(100, 96)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(3, 100)).astype(np.float32))
        t = quantize_int8(w)
        y = quantized_matmul_w8a8(x, t.q, t.scale, interpret=True)
        assert y.shape == (3, 96)

    def test_linear_q_act_quant_path(self, rng):
        from adaptive_sd_tpu.ops.matmul_q import linear_q

        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 5, 256)).astype(np.float32))
        t = quantize_int8(w)
        y = linear_q(x, t, use_pallas=True, act_quant=True)
        y_ref = linear_q(x, t, use_pallas=False)
        rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
        assert y.shape == (2, 5, 128) and rel < 0.03


class TestGroupedInt4:
    def test_error_reduction(self, rng):
        # heterogeneous row magnitudes (the real-LLM outlier pattern that
        # motivates group-wise scales; on iid gaussian the gain is only ~10%)
        base = rng.normal(size=(512, 256)).astype(np.float32)
        row_scale = np.repeat([1.0, 5.0, 25.0, 125.0], 128)[:, None].astype(np.float32)
        w = jnp.asarray(base * row_scale)
        per_chan = quantize_int4(w)
        grouped = quantize_int4(w, group_size=128)
        assert grouped.scale.shape == (4, 256)

        from adaptive_sd_tpu.ops import dequantize

        def small_row_err(t):
            # relative error on the small-magnitude rows — where per-channel
            # scales (dominated by the 125x rows) destroy the signal
            d = np.asarray(dequantize(t, jnp.float32))[:128]
            ref = np.asarray(w)[:128]
            return np.linalg.norm(d - ref) / np.linalg.norm(ref)

        assert small_row_err(per_chan) > 0.5     # catastrophic
        assert small_row_err(grouped) < 0.2      # near-baseline int4 noise

    def test_grouped_kernel_matches_ref(self, rng):
        from adaptive_sd_tpu.ops.matmul_q import quantized_matmul, quantized_matmul_ref

        K, N, M = 512, 256, 5
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        t = quantize_int4(w, group_size=128)
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=4)
        ker = quantized_matmul(x, t.q, t.scale, bits=4, interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)
        # and the whole thing is close to the float matmul
        rel = float(jnp.linalg.norm(ker - x @ w) / jnp.linalg.norm(x @ w))
        assert rel < 0.2  # iid-gaussian int4 noise floor; see test_error_reduction

    def test_indivisible_group_raises(self, rng):
        w = jnp.asarray(rng.normal(size=(100, 64)).astype(np.float32))
        with pytest.raises(ValueError):
            quantize_int4(w, group_size=128)


class TestSpeculativeAccept:
    """Distribution-preservation checks for the stochastic rejection rule
    (ops.sampling.speculative_accept)."""

    @staticmethod
    def _one_step(key, p_logits, q_logits, B, temperature=1.0, top_p=1.0):
        """Run B independent single-draft-token speculative steps; return the
        emitted first token per row."""
        from adaptive_sd_tpu.ops.sampling import (
            adjusted_logits,
            sample_with_topk,
            speculative_accept,
        )

        V = p_logits.shape[-1]
        kd, ka = jax.random.split(jax.random.key(17))
        q_rows = jnp.broadcast_to(q_logits, (B, V))
        res, q_ids, q_probs = sample_with_topk(
            q_rows, kd, k=V, temperature=temperature, top_p=top_p
        )
        draft = res.token[:, None]                        # [B, 1]
        draft_lp = res.logprob[:, None]
        t_adj = adjusted_logits(
            jnp.broadcast_to(p_logits, (B, 2, V)), temperature, top_p
        )
        target_logp = jax.nn.log_softmax(t_adj, axis=-1)  # [B, 2, V]
        n_acc, nxt, _ = speculative_accept(
            ka,
            draft,
            draft_lp,
            q_ids[:, None, :],
            q_probs[:, None, :],
            target_logp,
            jnp.ones((B,), jnp.int32),
        )
        emitted = jnp.where(n_acc >= 1, draft[:, 0], nxt)
        return np.asarray(emitted), np.asarray(n_acc)

    def test_two_hop_chain_preserves_final_marginal(self):
        """3-tier escalation chain (VERDICT r1 #7): tier0 samples a draft,
        tier1 verifies it stochastically and hands its OWN adjusted-dist
        top-K support to tier2, which verifies in turn. The rejection-rule
        theorem composes: tier2's emissions must be marginally ~ tier2's
        distribution — exactly what engine.verify_continue's return_topk
        carry implements (q for hop 2 = top-K of hop 1's logp_t)."""
        from adaptive_sd_tpu.ops.sampling import (
            sample_with_topk,
            speculative_accept,
        )

        V, B = 16, 60000
        rng = np.random.default_rng(7)
        p0 = jnp.asarray(rng.normal(0, 1.5, V), jnp.float32)   # tier-0 draft
        p1 = jnp.asarray(rng.normal(0, 1.5, V), jnp.float32)   # tier-1 mid
        p2 = jnp.asarray(rng.normal(0, 1.5, V), jnp.float32)   # tier-2 final
        k0, k1, k2 = jax.random.split(jax.random.key(5), 3)

        # hop 0: draft from tier 0 with full support
        res0, q0_ids, q0_probs = sample_with_topk(
            jnp.broadcast_to(p0, (B, V)), k0, k=V, temperature=1.0
        )
        # hop 1: tier 1 verifies -> emitted1 ~ p1 (theorem)
        logp1 = jnp.broadcast_to(jax.nn.log_softmax(p1), (B, 2, V))
        n1, nxt1, _ = speculative_accept(
            k1, res0.token[:, None], res0.logprob[:, None],
            q0_ids[:, None, :], q0_probs[:, None, :], logp1,
            jnp.ones((B,), jnp.int32),
        )
        emitted1 = jnp.where(n1 >= 1, res0.token, nxt1)
        # the support verify_continue carries for emitted1: tier 1's own
        # adjusted distribution at that slot (identical across slots here)
        lp1_row = jax.nn.log_softmax(p1)
        e1_lp = lp1_row[emitted1]
        q1_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, V))
        q1_probs = jnp.broadcast_to(jnp.exp(lp1_row), (B, V))
        # hop 2: tier 2 verifies tier 1's emission
        logp2 = jnp.broadcast_to(jax.nn.log_softmax(p2), (B, 2, V))
        n2, nxt2, _ = speculative_accept(
            k2, emitted1[:, None], e1_lp[:, None],
            q1_ids[:, None, :], q1_probs[:, None, :], logp2,
            jnp.ones((B,), jnp.int32),
        )
        emitted2 = np.asarray(jnp.where(n2 >= 1, emitted1, nxt2))

        target = np.asarray(jax.nn.softmax(p2))
        hist = np.bincount(emitted2, minlength=V) / B
        tv = 0.5 * np.abs(hist - target).sum()
        assert tv < 0.02, f"chained total variation {tv:.4f} vs final tier"
        # both hops must actually accept sometimes (the chain is real)
        assert float(jnp.mean(n1)) > 0.05 and float(jnp.mean(n2)) > 0.05

    def test_preserves_target_marginal(self):
        V, B = 16, 60000
        rng = np.random.default_rng(3)
        p_logits = jnp.asarray(rng.normal(0, 1.5, V), jnp.float32)
        q_logits = jnp.asarray(rng.normal(0, 1.5, V), jnp.float32)
        emitted, n_acc = self._one_step(jax.random.key(0), p_logits, q_logits, B)
        p = np.asarray(jax.nn.softmax(p_logits))
        hist = np.bincount(emitted, minlength=V) / B
        tv = 0.5 * np.abs(hist - p).sum()
        assert tv < 0.02, f"total variation {tv:.4f} vs target"
        # and the draft must actually be useful (some acceptance)
        assert 0.05 < n_acc.mean() < 1.0

    def test_identical_distributions_accept_everything(self):
        from adaptive_sd_tpu.ops.sampling import speculative_accept

        V, B, D = 8, 512, 4
        rng = np.random.default_rng(4)
        logits = jnp.asarray(rng.normal(0, 1, V), jnp.float32)
        logp = jax.nn.log_softmax(logits)
        draft = jnp.asarray(rng.integers(0, V, (B, D)), jnp.int32)
        draft_lp = jnp.take_along_axis(
            jnp.broadcast_to(logp, (B, D, V)), draft[..., None], axis=-1
        )[..., 0]
        q_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, D, V))
        q_probs = jnp.broadcast_to(jnp.exp(logp), (B, D, V))
        target_logp = jnp.broadcast_to(logp, (B, D + 1, V))
        n_acc, _, _ = speculative_accept(
            jax.random.key(1), draft, draft_lp, q_ids, q_probs, target_logp,
            jnp.full((B,), D, jnp.int32),
        )
        assert np.all(np.asarray(n_acc) == D)

    def test_impossible_draft_always_rejected(self):
        from adaptive_sd_tpu.ops.sampling import speculative_accept

        V, B = 8, 256
        # target puts ~zero mass on token 0; draft always proposes token 0
        p_logits = jnp.asarray([-40.0] + [1.0] * (V - 1), jnp.float32)
        target_logp = jnp.broadcast_to(jax.nn.log_softmax(p_logits), (B, 2, V))
        draft = jnp.zeros((B, 1), jnp.int32)
        draft_lp = jnp.full((B, 1), np.log(0.9), jnp.float32)
        q_probs = np.zeros((B, 1, V), np.float32)
        q_probs[:, :, 0] = 0.9
        q_probs[:, :, 1] = 0.1
        q_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, 1, V))
        n_acc, nxt, _ = speculative_accept(
            jax.random.key(2), draft, draft_lp, q_ids, jnp.asarray(q_probs),
            target_logp, jnp.ones((B,), jnp.int32),
        )
        assert np.all(np.asarray(n_acc) == 0)
        assert np.all(np.asarray(nxt) != 0)

    def test_draft_len_bounds_acceptance(self):
        from adaptive_sd_tpu.ops.sampling import speculative_accept

        V, B, D = 8, 64, 6
        logp = jax.nn.log_softmax(jnp.zeros((V,), jnp.float32))
        draft = jnp.zeros((B, D), jnp.int32)
        draft_lp = jnp.broadcast_to(logp[0], (B, D))
        q_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, D, V))
        q_probs = jnp.broadcast_to(jnp.exp(logp), (B, D, V))
        target_logp = jnp.broadcast_to(logp, (B, D + 1, V))
        lens = jnp.asarray(np.arange(B) % (D + 1), jnp.int32)
        n_acc, _, _ = speculative_accept(
            jax.random.key(3), draft, draft_lp, q_ids, q_probs, target_logp, lens
        )
        assert np.all(np.asarray(n_acc) == np.asarray(lens))

    def test_sample_with_topk_matches_sample_distribution(self):
        from adaptive_sd_tpu.ops.sampling import sample_with_topk

        logits = jnp.asarray(
            np.random.default_rng(5).normal(0, 2, (4, 32)), jnp.float32
        )
        res, ids, probs = sample_with_topk(
            logits, jax.random.key(9), k=8, temperature=0.7, top_p=0.9
        )
        # top-k probs are sorted descending and sum to <= 1
        p = np.asarray(probs)
        assert np.all(np.diff(p, axis=-1) <= 1e-6)
        assert np.all(p.sum(-1) <= 1.0 + 1e-5)
        # sampled token's logprob matches the adjusted distribution
        from adaptive_sd_tpu.ops.sampling import adjusted_logits

        logp = jax.nn.log_softmax(adjusted_logits(logits, 0.7, 0.9), axis=-1)
        ref = np.take_along_axis(np.asarray(logp), np.asarray(res.token)[:, None], 1)[:, 0]
        assert np.allclose(np.asarray(res.logprob), ref, atol=1e-5)
