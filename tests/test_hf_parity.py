"""Cross-implementation parity: our functional Qwen2 vs HuggingFace's
Qwen2ForCausalLM on identical random weights. Catches architecture-convention
bugs (RoPE style, GQA head layout, bias placement, norm epsilon) that
self-consistency tests cannot see. float32, CPU."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from adaptive_sd_tpu.engine import PagedKVCache
from adaptive_sd_tpu.models import TINY, init_params
from adaptive_sd_tpu.models.qwen import decode_step, prefill


@pytest.fixture(scope="module")
def pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    spec = TINY
    cfg = Qwen2Config(
        vocab_size=spec.vocab_size, hidden_size=spec.hidden,
        num_hidden_layers=spec.n_layers, num_attention_heads=spec.n_heads,
        num_key_value_heads=spec.n_kv_heads, intermediate_size=spec.ffn,
        head_dim=spec.head_dim, rope_theta=spec.rope_theta,
        rms_norm_eps=spec.rms_eps, max_position_embeddings=spec.max_seq_len,
        tie_word_embeddings=False, attention_bias=True,
    )
    hf = Qwen2ForCausalLM(cfg).eval()
    params = init_params(spec, jax.random.key(0), dtype=jnp.float32)

    sd = {
        "model.embed_tokens.weight": torch.tensor(np.asarray(params["embed"])),
        "model.norm.weight": torch.tensor(np.asarray(params["final_norm"])),
        "lm_head.weight": torch.tensor(np.asarray(params["lm_head"]).T.copy()),
    }
    for i, L in enumerate(params["layers"]):
        b = f"model.layers.{i}."
        for ours, theirs, transpose in [
            ("q_proj", "self_attn.q_proj.weight", True),
            ("k_proj", "self_attn.k_proj.weight", True),
            ("v_proj", "self_attn.v_proj.weight", True),
            ("o_proj", "self_attn.o_proj.weight", True),
            ("gate_proj", "mlp.gate_proj.weight", True),
            ("up_proj", "mlp.up_proj.weight", True),
            ("down_proj", "mlp.down_proj.weight", True),
            ("q_bias", "self_attn.q_proj.bias", False),
            ("k_bias", "self_attn.k_proj.bias", False),
            ("v_bias", "self_attn.v_proj.bias", False),
            ("input_norm", "input_layernorm.weight", False),
            ("post_norm", "post_attention_layernorm.weight", False),
        ]:
            arr = np.asarray(L[ours])
            sd[b + theirs] = torch.tensor(arr.T.copy() if transpose else arr)
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("rotary" in m for m in missing)  # inv_freq buffers only
    return spec, params, hf


class TestHFParity:
    def test_prefill_logits_match(self, pair):
        spec, params, hf = pair
        rng = np.random.default_rng(0)
        S = 12
        toks = rng.integers(1, spec.vocab_size, size=(1, S))
        with torch.no_grad():
            hf_logits = hf(torch.tensor(toks)).logits[0].numpy()
        cache = PagedKVCache.create(spec, n_pages=4, page_size=16)
        tables = jnp.asarray([[0, 1]], jnp.int32)
        ours, _ = prefill(
            params, spec, jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
            cache, tables, use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(ours[0]), hf_logits[-1], rtol=1e-4, atol=1e-4
        )

    def test_greedy_continuation_matches(self, pair):
        """Five greedy decode steps must produce the same tokens HF produces
        (exercises the paged-KV decode path incl. INT8 KV rounding: compare
        argmax, not raw logits)."""
        spec, params, hf = pair
        rng = np.random.default_rng(1)
        S = 8
        toks = rng.integers(1, spec.vocab_size, size=(1, S))
        with torch.no_grad():
            hf_out = hf.generate(
                torch.tensor(toks), max_new_tokens=5, do_sample=False,
                pad_token_id=0,
            )[0, S:].tolist()

        cache = PagedKVCache.create(spec, n_pages=8, page_size=16)
        tables = jnp.asarray([list(range(8))], jnp.int32)
        logits, cache = prefill(
            params, spec, jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
            cache, tables, use_pallas=False,
        )
        ours = []
        cur = int(jnp.argmax(logits[0]))
        for i in range(5):
            ours.append(cur)
            logits, cache = decode_step(
                params, spec, jnp.asarray([cur], jnp.int32),
                jnp.asarray([S + i], jnp.int32), cache, tables, use_pallas=False,
            )
            cur = int(jnp.argmax(logits[0]))
        assert ours == hf_out
