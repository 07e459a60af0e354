"""Collective-matmul overlap (parallel/overlap.py): the ppermute-ring
row-parallel matmul must agree with matmul-then-psum and with the
single-device reference, for raw/int8/int4 weights, and the TP forward with
``overlap_collectives=True`` must reproduce the baseline TP forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adaptive_sd_tpu.models import TINY, init_params, quantize_model
from adaptive_sd_tpu.models.qwen import fuse_projections
from adaptive_sd_tpu.ops.quant import QuantizedTensor, dequantize, pack_int4
from adaptive_sd_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from adaptive_sd_tpu.parallel.overlap import (
    overlap_compatible,
    ring_row_parallel,
    row_parallel_reduce,
)

K, N, B = 64, 48, 4


def mesh1d(tp):
    return Mesh(np.asarray(jax.devices()[:tp]), (AXIS_TP,))


def _quant_rowsharded(w_np, tp, bits, group_size=None):
    """Quantize a [K, N] weight per shard-local K block (the layout
    transform_params_for_tp produces), concatenated back to global K."""
    k_loc = K // tp
    qs, ss = [], []
    for s in range(tp):
        block = jnp.asarray(w_np[s * k_loc : (s + 1) * k_loc])
        if bits == 8:
            scale = jnp.max(jnp.abs(block), axis=0) / 127.0
            qs.append(jnp.round(block / scale).astype(jnp.int8))
            ss.append(scale)
        else:
            if group_size:
                g = block.reshape(k_loc // group_size, group_size, N)
                scale = jnp.max(jnp.abs(g), axis=1) / 7.0  # [k_loc/gs, N]
                q = jnp.round(g / scale[:, None, :]).reshape(k_loc, N)
            else:
                scale = jnp.max(jnp.abs(block), axis=0) / 7.0
                q = jnp.round(block / scale)
            qs.append(pack_int4(q.astype(jnp.int8)))
            ss.append(scale)
    if bits == 8:
        # per-block scales differ; emulate per-channel by sharing the global
        # scale instead (int8 path uses one [N] scale in production)
        scale = jnp.max(jnp.abs(jnp.asarray(w_np)), axis=0) / 127.0
        q = jnp.round(jnp.asarray(w_np) / scale).astype(jnp.int8)
        return QuantizedTensor(q=q, scale=scale, bits=8)
    if group_size:
        return QuantizedTensor(q=jnp.concatenate(qs, 0),
                               scale=jnp.concatenate(ss, 0), bits=4)
    # per-channel int4 shares one scale globally for exactness of the test
    scale = jnp.max(jnp.abs(jnp.asarray(w_np)), axis=0) / 7.0
    q = jnp.round(jnp.asarray(w_np) / scale).astype(jnp.int8)
    k_loc = K // tp
    packed = jnp.concatenate(
        [pack_int4(q[s * k_loc : (s + 1) * k_loc]) for s in range(tp)], 0
    )
    return QuantizedTensor(q=packed, scale=scale, bits=4)


def _linear(x, w):
    if isinstance(w, QuantizedTensor):
        from adaptive_sd_tpu.ops.matmul_q import linear_q

        return linear_q(x, w, use_pallas=False)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _w_specs(w, tp_axis):
    if isinstance(w, QuantizedTensor):
        s = P() if w.scale.ndim == 1 else P(tp_axis, None)
        return QuantizedTensor(q=P(tp_axis, None), scale=s, bits=w.bits)
    return P(tp_axis, None)


def _run_ring_vs_psum(w, tp):
    """Inside one shard_map: ring result and psum result for the same local
    weight shard; returns both (host)."""
    mesh = mesh1d(tp)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    wspec = _w_specs(w, AXIS_TP)

    import functools

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, AXIS_TP), wspec),
        out_specs=(P(), P()),
    )
    def run(x_l, w_l):
        ring = ring_row_parallel(x_l, w_l, AXIS_TP, tp, _linear)
        ps = jax.lax.psum(_linear(x_l, w_l), AXIS_TP)
        return ring, ps

    return run(x, w)


class TestRingRowParallel:
    @pytest.mark.parametrize("tp", [2, 4])
    def test_raw_f32(self, tp):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        ring, ps = _run_ring_vs_psum(w, tp)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ps),
                                   atol=1e-5, rtol=0)

    @pytest.mark.parametrize("tp", [2, 4])
    def test_int8(self, tp):
        rng = np.random.default_rng(0)
        w = _quant_rowsharded(rng.standard_normal((K, N)).astype(np.float32),
                              tp, bits=8)
        ring, ps = _run_ring_vs_psum(w, tp)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ps),
                                   atol=1e-5, rtol=0)

    @pytest.mark.parametrize("tp", [2, 4])
    def test_int4_per_channel(self, tp):
        rng = np.random.default_rng(0)
        w = _quant_rowsharded(rng.standard_normal((K, N)).astype(np.float32),
                              tp, bits=4)
        ring, ps = _run_ring_vs_psum(w, tp)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ps),
                                   atol=1e-5, rtol=0)

    def test_int4_grouped(self):
        tp, gs = 2, 16
        rng = np.random.default_rng(0)
        w = _quant_rowsharded(rng.standard_normal((K, N)).astype(np.float32),
                              tp, bits=4, group_size=gs)
        assert w.scale.shape == (K // gs, N)
        ring, ps = _run_ring_vs_psum(w, tp)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ps),
                                   atol=1e-5, rtol=0)

    def test_compatibility_gate(self):
        w = jnp.zeros((K, 47))  # 47 not divisible by tp
        assert not overlap_compatible(w, 2)
        assert overlap_compatible(jnp.zeros((K, N)), 2)
        assert not overlap_compatible(jnp.zeros((K, N)), 1)

    def test_fallback_is_psum(self):
        """row_parallel_reduce with overlap on an incompatible N still
        reduces correctly via psum."""
        tp = 2
        mesh = mesh1d(tp)
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.standard_normal((K, 47)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)

        import functools

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(None, AXIS_TP), P(AXIS_TP, None)),
            out_specs=P(),
        )
        def run(x_l, w_l):
            return row_parallel_reduce(x_l, w_l, AXIS_TP, tp, _linear,
                                       overlap=True)

        ref = jnp.dot(x, w)
        np.testing.assert_allclose(np.asarray(run(x, w)), np.asarray(ref),
                                   atol=1e-5, rtol=0)


class TestTPForwardOverlap:
    """make_tp_forward(overlap_collectives=True) == baseline TP forward."""

    @pytest.fixture(scope="class")
    def params_f32(self):
        return init_params(TINY, jax.random.key(0), dtype=jnp.float32)

    def _compare(self, params, atol=2e-4):
        from adaptive_sd_tpu.engine import PagedKVCache
        from adaptive_sd_tpu.models.qwen_tp import (
            make_tp_forward,
            prepare_tp_params,
            shard_cache_tp,
        )

        tp = 2
        devs = np.asarray(jax.devices()[:tp]).reshape(1, tp)
        mesh = Mesh(devs, (AXIS_DP, AXIS_TP))
        tparams = prepare_tp_params(params, TINY, mesh)
        rng = np.random.default_rng(0)
        Bx, S = 2, 11
        toks = jnp.asarray(rng.integers(1, TINY.vocab_size, (Bx, S)), jnp.int32)
        seq_lens = jnp.asarray([S, S - 3], jnp.int32)
        tables = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)

        outs = {}
        for overlap in (False, True):
            fwd = make_tp_forward(TINY, mesh, use_pallas=False,
                                  overlap_collectives=overlap)
            cache = shard_cache_tp(PagedKVCache.create(TINY, 32, 16), mesh)
            logits, cache = fwd.prefill(tparams, TINY, toks, seq_lens, cache,
                                        tables)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logits2, cache = fwd.decode_step(tparams, TINY, nxt, seq_lens,
                                             cache, tables)
            outs[overlap] = (np.asarray(logits), np.asarray(logits2))
        np.testing.assert_allclose(outs[True][0], outs[False][0], atol=atol,
                                   rtol=0)
        np.testing.assert_allclose(outs[True][1], outs[False][1], atol=atol,
                                   rtol=0)

    def test_int8_fused(self, params_f32):
        # one end-to-end case (production int8 fused-projection format);
        # per-weight-format ring correctness is covered by the cheaper
        # TestRingRowParallel unit tests — the full-forward compile is slow.
        self._compare(quantize_model(fuse_projections(params_f32), bits=8))
