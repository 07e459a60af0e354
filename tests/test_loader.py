"""Weight loader tests: synthesize an HF-style safetensors checkpoint for the
TINY spec, load it, and check forward-pass equivalence + npz round-trip."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sd_tpu.core.exceptions import ModelLoadError
from adaptive_sd_tpu.models import TINY, init_params
from adaptive_sd_tpu.models.loader import (
    load_params,
    load_params_npz,
    save_params_npz,
    verify_checkpoint,
)
from adaptive_sd_tpu.models.qwen import decode_step, quantize_model
from adaptive_sd_tpu.engine import PagedKVCache


def _write_hf_checkpoint(tmp_path, params):
    """Write our params tree as an HF-style Qwen2 safetensors shard."""
    from safetensors.numpy import save_file

    tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32).T.copy(),
    }
    name_map = {
        "q_proj": "self_attn.q_proj.weight",
        "k_proj": "self_attn.k_proj.weight",
        "v_proj": "self_attn.v_proj.weight",
        "o_proj": "self_attn.o_proj.weight",
        "gate_proj": "mlp.gate_proj.weight",
        "up_proj": "mlp.up_proj.weight",
        "down_proj": "mlp.down_proj.weight",
    }
    for li, layer in enumerate(params["layers"]):
        base = f"model.layers.{li}."
        for ours, hf in name_map.items():
            tensors[base + hf] = np.asarray(layer[ours], np.float32).T.copy()
        for ours, hf in [("q_bias", "self_attn.q_proj.bias"),
                         ("k_bias", "self_attn.k_proj.bias"),
                         ("v_bias", "self_attn.v_proj.bias")]:
            tensors[base + hf] = np.asarray(layer[ours], np.float32)
        tensors[base + "input_layernorm.weight"] = np.asarray(layer["input_norm"], np.float32)
        tensors[base + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_norm"], np.float32
        )
    save_file(tensors, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(
        json.dumps(
            {
                "hidden_size": TINY.hidden,
                "num_hidden_layers": TINY.n_layers,
                "num_attention_heads": TINY.n_heads,
                "num_key_value_heads": TINY.n_kv_heads,
                "intermediate_size": TINY.ffn,
            }
        )
    )


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    _write_hf_checkpoint(tmp, params)
    return tmp, params


def _logits_of(params):
    cache = PagedKVCache.create(TINY, n_pages=4, page_size=16)
    tables = jnp.asarray([[0, 1]], jnp.int32)
    logits, _ = decode_step(
        params, TINY, jnp.asarray([7], jnp.int32), jnp.asarray([0], jnp.int32),
        cache, tables, use_pallas=False,
    )
    return np.asarray(logits[0])


class TestLoader:
    def test_verify_checkpoint(self, checkpoint):
        tmp, _ = checkpoint
        rep = verify_checkpoint(str(tmp), TINY)
        assert rep["ok"], rep

    def test_verify_detects_mismatch(self, checkpoint, tmp_path):
        tmp, _ = checkpoint
        import dataclasses

        wrong = dataclasses.replace(TINY, hidden=999, name="wrong")
        rep = verify_checkpoint(str(tmp), wrong)
        assert not rep["ok"]

    def test_unquantized_load_matches_source(self, checkpoint):
        tmp, params = checkpoint
        loaded = load_params(str(tmp), TINY, bits=None, dtype=jnp.float32)
        np.testing.assert_allclose(_logits_of(loaded), _logits_of(params), rtol=1e-5)

    def test_quantized_load_matches_offline_quant(self, checkpoint):
        tmp, params = checkpoint
        loaded = load_params(str(tmp), TINY, bits=8)
        reference = quantize_model(params, bits=8)
        np.testing.assert_allclose(
            _logits_of(loaded), _logits_of(reference), rtol=5e-2, atol=5e-2
        )

    def test_missing_dir_raises(self):
        with pytest.raises(ModelLoadError):
            load_params("/nonexistent", TINY)

    def test_spec_from_checkpoint_infers_dims(self, checkpoint):
        from adaptive_sd_tpu.models.loader import spec_from_checkpoint

        tmp, _ = checkpoint
        spec = spec_from_checkpoint(str(tmp))
        assert (spec.hidden, spec.n_layers, spec.n_heads, spec.n_kv_heads,
                spec.ffn) == (TINY.hidden, TINY.n_layers, TINY.n_heads,
                              TINY.n_kv_heads, TINY.ffn)

    def test_spec_from_checkpoint_missing_config(self, tmp_path):
        from adaptive_sd_tpu.models.loader import spec_from_checkpoint

        with pytest.raises(ModelLoadError):
            spec_from_checkpoint(str(tmp_path))

    def test_smoke_build_cascade_from_dirs(self, checkpoint):
        """The real-weight smoke path: dir -> inferred spec -> verified ->
        loaded -> engine-backed stage that generates (VERDICT round-1 #3)."""
        import importlib.util
        import pathlib as _pl

        root = _pl.Path(__file__).resolve().parents[1]
        spec_mod = importlib.util.spec_from_file_location(
            "real_smoke", root / "scripts" / "real_smoke.py"
        )
        real_smoke = importlib.util.module_from_spec(spec_mod)
        spec_mod.loader.exec_module(real_smoke)

        tmp, _ = checkpoint
        # config.json written by the fixture lacks vocab_size -> defaults to
        # Qwen's 151936, which mismatches the tensors; write the full config
        import json as _json

        cfg = _json.loads((tmp / "config.json").read_text())
        cfg.update(vocab_size=TINY.vocab_size, head_dim=TINY.head_dim,
                   rope_theta=TINY.rope_theta, max_position_embeddings=64)
        (tmp / "config.json").write_text(_json.dumps(cfg))

        stages, reports = real_smoke.build_cascade(
            [str(tmp)], [8], use_pallas=False, n_pages=32
        )
        assert reports[0]["ok"]
        out = stages[0].generate_text(["hello world"], max_new=4)[0]
        assert len(out.token_ids) >= 1

    def test_npz_roundtrip_quantized(self, checkpoint, tmp_path):
        tmp, params = checkpoint
        q = quantize_model(params, bits=8)
        save_params_npz(q, str(tmp_path / "model.npz"))
        back = load_params_npz(str(tmp_path / "model.npz"))
        np.testing.assert_allclose(_logits_of(back), _logits_of(q), rtol=1e-5, atol=1e-5)
