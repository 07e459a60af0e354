"""shard_map-wrapped Pallas linears: numerics vs unsharded reference on the
virtual CPU mesh (kernels in interpret mode per shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.ops import quantize_int8, quantized_matmul_ref
from adaptive_sd_tpu.ops.sharded import (
    shard_weight_column,
    shard_weight_row,
    tp_linear_column,
    tp_linear_row,
    tp_mlp_block,
)
from adaptive_sd_tpu.parallel import build_mesh


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return build_mesh(dp=1, tp=4, devices=jax.devices()[:4])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    K, N, M = 256, 512, 8
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    return x, quantize_int8(w)


class TestTpLinears:
    def test_column_parallel_matches_reference(self, mesh, data):
        x, t = data
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=8)
        ts = shard_weight_column(t, mesh)
        out = tp_linear_column(x, ts, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
        # weight really lives sharded
        assert len(ts.q.sharding.device_set) == 4

    def test_row_parallel_matches_reference(self, mesh, data):
        x, t = data
        ref = quantized_matmul_ref(x, t.q, t.scale, bits=8)
        ts = shard_weight_row(t, mesh)
        out = tp_linear_row(x, ts, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_mlp_block_single_allreduce_matches(self, mesh):
        rng = np.random.default_rng(1)
        H, F, M = 128, 512, 8
        x = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
        gate = quantize_int8(jnp.asarray(rng.normal(size=(H, F)).astype(np.float32)))
        up = quantize_int8(jnp.asarray(rng.normal(size=(H, F)).astype(np.float32)))
        down = quantize_int8(jnp.asarray(rng.normal(size=(F, H)).astype(np.float32)))

        g = quantized_matmul_ref(x, gate.q, gate.scale, bits=8)
        u = quantized_matmul_ref(x, up.q, up.scale, bits=8)
        h = jax.nn.silu(g) * u
        ref = quantized_matmul_ref(h, down.q, down.scale, bits=8)

        out = tp_mlp_block(
            x,
            shard_weight_column(gate, mesh),
            shard_weight_column(up, mesh),
            shard_weight_row(down, mesh),
            mesh,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_column_then_row_pair(self, mesh, data):
        """column output feeds row input without resharding (the Megatron
        pairing): end result replicated and correct."""
        x, t_col = data
        rng = np.random.default_rng(2)
        K2 = t_col.out_features
        w2 = jnp.asarray(rng.normal(size=(K2, 128)).astype(np.float32))
        t_row = quantize_int8(w2)

        y_col = tp_linear_column(x, shard_weight_column(t_col, mesh), mesh)
        out = tp_linear_row(y_col, shard_weight_row(t_row, mesh), mesh)

        mid = quantized_matmul_ref(x, t_col.q, t_col.scale, bits=8)
        ref = quantized_matmul_ref(mid, t_row.q, t_row.scale, bits=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
