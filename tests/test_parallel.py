"""Sharding tests on the 8-device virtual CPU mesh: mesh construction, tier
placement planning, sharded decode/prefill execution vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from adaptive_sd_tpu.core.exceptions import ShardingError
from adaptive_sd_tpu.engine import PagedKVCache
from adaptive_sd_tpu.models import TINY128, init_params
from adaptive_sd_tpu.models.qwen import decode_step, prefill
from adaptive_sd_tpu.parallel import (
    TierPlacement,
    batch_sharding,
    build_mesh,
    param_specs,
    plan_tier_placements,
    shard_cache,
    shard_params,
)

PAGE = 128


class TestMesh:
    def test_build_mesh_shapes(self, eight_devices):
        m = build_mesh(dp=2, tp=4)
        assert m.shape == {"dp": 2, "tp": 4}
        m2 = build_mesh(dp=1, tp=8)
        assert m2.shape["tp"] == 8

    def test_bad_factorization_raises(self, eight_devices):
        with pytest.raises(ShardingError):
            build_mesh(dp=3, tp=3)

    def test_tier_placement_mesh(self, eight_devices):
        t = TierPlacement("32b", (2, 3), dp=1, tp=2)
        m = t.mesh()
        assert m.shape == {"dp": 1, "tp": 2}

    def test_placement_out_of_range(self, eight_devices):
        with pytest.raises(ShardingError):
            TierPlacement("x", (42,), tp=1).mesh()


class TestPlacementPlanner:
    def test_disjoint_and_sized(self):
        GB = 1 << 30
        placements = plan_tier_placements(
            ["7b", "32b", "72b"],
            [7 * GB, 32 * GB, 72 * GB],
            n_devices=16,
            device_hbm_bytes=16 * GB,
        )
        ids = [i for p in placements for i in p.device_ids]
        assert len(ids) == len(set(ids)) <= 16
        by_name = {p.name: p for p in placements}
        assert len(by_name["72b"].device_ids) >= 8  # 72B needs >= 8 chips at 30% kv
        assert len(by_name["7b"].device_ids) >= 1

    def test_overflow_raises(self):
        GB = 1 << 30
        with pytest.raises(ShardingError):
            plan_tier_placements(["72b"], [400 * GB], n_devices=2, device_hbm_bytes=16 * GB)


class TestShardedModel:
    @pytest.fixture(scope="class")
    def setup(self, eight_devices):
        params = init_params(TINY128, jax.random.key(0), dtype=jnp.float32)
        return params

    def test_param_specs_cover_tree(self, setup):
        specs = param_specs(setup, TINY128, tp=2)
        # same tree structure
        jax.tree.map(lambda a, b: None, setup, specs)

    def test_sharded_decode_matches_single_device(self, setup):
        """The tp=4 GSPMD decode step must produce the same logits as the
        unsharded one (collectives inserted by XLA, math unchanged)."""
        mesh = build_mesh(dp=1, tp=4, devices=jax.devices()[:4])
        params = setup
        B = 4
        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(1, TINY128.vocab_size, (B,)), jnp.int32)
        pos = jnp.zeros((B,), jnp.int32)
        tables = jnp.asarray(rng.permutation(16).reshape(B, 4), jnp.int32)

        cache0 = PagedKVCache.create(TINY128, n_pages=16, page_size=PAGE)
        ref_logits, _ = decode_step(
            params, TINY128, toks, pos, cache0, tables, use_pallas=False
        )

        sp = shard_params(params, TINY128, mesh)
        sc = shard_cache(PagedKVCache.create(TINY128, n_pages=16, page_size=PAGE), TINY128, mesh)
        f = jax.jit(
            lambda p, t, ps, c, bt: decode_step(p, TINY128, t, ps, c, bt, use_pallas=False)
        )
        out_logits, out_cache = f(sp, toks, pos, sc, tables)
        np.testing.assert_allclose(
            np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
        )
        # verify weights actually sharded
        qp = sp["layers"][0]["q_proj"]
        assert len(qp.sharding.device_set) == 4

    def test_dp_tp_prefill_runs(self, setup):
        mesh = build_mesh(dp=2, tp=4)
        params = shard_params(setup, TINY128, mesh)
        cache = shard_cache(
            PagedKVCache.create(TINY128, n_pages=16, page_size=PAGE), TINY128, mesh
        )
        B, S = 4, PAGE
        rng = np.random.default_rng(1)
        toks = jax.device_put(
            jnp.asarray(rng.integers(1, TINY128.vocab_size, (B, S)), jnp.int32),
            batch_sharding(mesh),
        )
        seq_lens = jax.device_put(jnp.full((B,), S // 2, jnp.int32), batch_sharding(mesh))
        tables = jax.device_put(
            jnp.asarray(rng.permutation(16).reshape(B, 4), jnp.int32), batch_sharding(mesh)
        )
        f = jax.jit(
            lambda p, t, sl, c, bt: prefill(p, TINY128, t, sl, c, bt, use_pallas=False)
        )
        logits, _ = f(params, toks, seq_lens, cache, tables)
        assert logits.shape == (B, TINY128.vocab_size)
        assert np.all(np.isfinite(np.asarray(logits, np.float32)))


class TestDisjointTierPlacement:
    def test_two_engines_on_disjoint_submeshes(self, eight_devices):
        """Two cascade tiers pinned to disjoint 4-device sub-meshes produce
        the same tokens as an unpinned single-device engine, and their params
        live on their own device sets."""
        import jax
        import jax.numpy as jnp

        from adaptive_sd_tpu.engine import TierEngine
        from adaptive_sd_tpu.models import TINY128, init_params

        params = init_params(TINY128, jax.random.key(0), dtype=jnp.float32)
        ref_eng = TierEngine(TINY128, params, n_pages=32, use_pallas=False)
        ref_out = ref_eng.generate([[5, 6, 7]], max_new=4)[0]

        mesh_a = build_mesh(dp=1, tp=4, devices=jax.devices()[:4])
        mesh_b = build_mesh(dp=1, tp=4, devices=jax.devices()[4:8])
        eng_a = TierEngine(TINY128, params, n_pages=32, mesh=mesh_a)
        eng_b = TierEngine(TINY128, params, n_pages=32, mesh=mesh_b)

        out_a = eng_a.generate([[5, 6, 7]], max_new=4)[0]
        out_b = eng_b.generate([[5, 6, 7]], max_new=4)[0]
        assert out_a.token_ids.tolist() == ref_out.token_ids.tolist()
        assert out_b.token_ids.tolist() == ref_out.token_ids.tolist()

        devs_a = eng_a.params["layers"][0]["q_proj"].sharding.device_set
        devs_b = eng_b.params["layers"][0]["q_proj"].sharding.device_set
        assert devs_a.isdisjoint(devs_b)
        assert len(devs_a) == 4 and len(devs_b) == 4


class TestMultihostMesh:
    def test_dcn_dp_tp_mesh_runs_prefill(self, eight_devices):
        """(dcn=2, dp=2, tp=2) mesh on the virtual CPU devices: batch shards
        over (dcn, dp), weights over tp; sharded prefill executes."""
        from adaptive_sd_tpu.engine import PagedKVCache
        from adaptive_sd_tpu.models import TINY128, init_params
        from adaptive_sd_tpu.models.qwen import prefill
        from adaptive_sd_tpu.parallel import build_multihost_mesh

        mesh = build_multihost_mesh(dp=2, tp=2, dcn=2)
        assert mesh.shape == {"dcn": 2, "dp": 2, "tp": 2}
        params = shard_params(
            init_params(TINY128, jax.random.key(0), jnp.float32), TINY128, mesh
        )
        cache = shard_cache(PagedKVCache.create(TINY128, 16, PAGE), TINY128, mesh)
        bs = batch_sharding(mesh)
        assert "dcn" in str(bs.spec)
        B, S = 4, PAGE
        rng = np.random.default_rng(0)
        toks = jax.device_put(
            jnp.asarray(rng.integers(1, TINY128.vocab_size, (B, S)), jnp.int32), bs
        )
        lens = jax.device_put(jnp.full((B,), S // 2, jnp.int32), bs)
        tables = jax.device_put(
            jnp.asarray(rng.permutation(16).reshape(B, 4), jnp.int32), bs
        )
        f = jax.jit(lambda p, t, sl, c, bt: prefill(p, TINY128, t, sl, c, bt, use_pallas=False))
        logits, _ = f(params, toks, lens, cache, tables)
        assert logits.shape == (B, TINY128.vocab_size)
        assert np.all(np.isfinite(np.asarray(logits, np.float32)))

    def test_bad_factorization(self, eight_devices):
        from adaptive_sd_tpu.parallel import build_multihost_mesh

        with pytest.raises(ShardingError):
            build_multihost_mesh(dp=3, tp=2, dcn=2)


class TestFusedSharding:
    def test_fused_params_shard_and_run(self, eight_devices):
        """Fused qkv/gateup layouts must shard (column-parallel) and produce
        the same logits as unsharded fused execution."""
        from adaptive_sd_tpu.engine import PagedKVCache, TierEngine
        from adaptive_sd_tpu.models import TINY128, init_params
        from adaptive_sd_tpu.models.qwen import fuse_projections

        params = fuse_projections(init_params(TINY128, jax.random.key(0), jnp.float32))
        mesh = build_mesh(dp=1, tp=4, devices=jax.devices()[:4])
        ref = TierEngine(TINY128, params, n_pages=32, use_pallas=False)
        ref_out = ref.generate([[5, 6, 7]], max_new=4)[0]
        eng = TierEngine(TINY128, params, n_pages=32, mesh=mesh)
        out = eng.generate([[5, 6, 7]], max_new=4)[0]
        assert out.token_ids.tolist() == ref_out.token_ids.tolist()
        assert len(eng.params["layers"][0]["qkv_proj"].sharding.device_set) == 4
