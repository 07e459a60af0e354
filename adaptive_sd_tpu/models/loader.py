"""HF safetensors weight loading + streaming offline quantization.

Role parity: reference model loading via vLLM/bitsandbytes
(``src/serving/real_model_pipeline.py:89-115``,
``src/training/generate_training_data.py:64-85``) and the download scripts'
verification role (``scripts/download_qwen3_models.py``). TPU-first: weights
stream tensor-by-tensor from safetensors shards straight into packed INT8/
INT4 QuantizedTensors on host, then device_put once — peak host memory is
O(largest tensor), not O(model).

Name mapping (HF Qwen2 -> ours): weights arrive [out, in] and are transposed
to [in, out] to match the engine's x @ W convention.
"""

from __future__ import annotations

import json
import pathlib
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..core.exceptions import ModelLoadError
from .config import ModelSpec
from .qwen import Params
from ..ops.quant import quantize_int4, quantize_int8

_LAYER_MAP = {
    "self_attn.q_proj.weight": ("q_proj", True),
    "self_attn.k_proj.weight": ("k_proj", True),
    "self_attn.v_proj.weight": ("v_proj", True),
    "self_attn.o_proj.weight": ("o_proj", True),
    "mlp.gate_proj.weight": ("gate_proj", True),
    "mlp.up_proj.weight": ("up_proj", True),
    "mlp.down_proj.weight": ("down_proj", True),
    "self_attn.q_proj.bias": ("q_bias", False),
    "self_attn.k_proj.bias": ("k_bias", False),
    "self_attn.v_proj.bias": ("v_bias", False),
    "input_layernorm.weight": ("input_norm", False),
    "post_attention_layernorm.weight": ("post_norm", False),
}

QUANTIZABLE = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}


def _iter_safetensors(model_dir: pathlib.Path) -> Iterator[tuple[str, np.ndarray]]:
    try:
        from safetensors import safe_open
    except ImportError as exc:  # pragma: no cover
        raise ModelLoadError("safetensors not available", cause=exc) from exc

    shards = sorted(model_dir.glob("*.safetensors"))
    if not shards:
        raise ModelLoadError(f"no .safetensors files under {model_dir}")
    for shard in shards:
        with safe_open(str(shard), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def spec_from_checkpoint(model_dir: str, *, name: Optional[str] = None) -> ModelSpec:
    """Infer a ModelSpec from an HF checkpoint's ``config.json``.

    Lets the real-weight path run on ANY Qwen2-family checkpoint directory
    without a hand-registered spec (reference analog: vLLM reads the HF
    config itself, ``src/serving/real_model_pipeline.py:89-115``).
    """
    p = pathlib.Path(model_dir)
    cfg_path = p / "config.json"
    if not cfg_path.exists():
        raise ModelLoadError(f"{model_dir}: config.json missing — cannot infer spec")
    cfg = json.loads(cfg_path.read_text())
    try:
        hidden = int(cfg["hidden_size"])
        n_heads = int(cfg["num_attention_heads"])
        spec = ModelSpec(
            name=name or cfg.get("_name_or_path") or p.name or "checkpoint",
            vocab_size=int(cfg.get("vocab_size", 151_936)),
            hidden=hidden,
            n_layers=int(cfg["num_hidden_layers"]),
            n_heads=n_heads,
            n_kv_heads=int(cfg.get("num_key_value_heads", n_heads)),
            head_dim=int(cfg.get("head_dim", hidden // n_heads)),
            ffn=int(cfg["intermediate_size"]),
            rope_theta=float(cfg.get("rope_theta", 1_000_000.0)),
            rms_eps=float(cfg.get("rms_norm_eps", 1e-6)),
            max_seq_len=int(cfg.get("max_position_embeddings", 4096)),
            tie_embeddings=bool(cfg.get("tie_word_embeddings", False)),
            attn_bias=True,
        )
    except KeyError as exc:
        raise ModelLoadError(f"{model_dir}: config.json missing field {exc}") from exc
    return spec


def verify_checkpoint(model_dir: str, spec: ModelSpec) -> dict:
    """Light-weight checkpoint sanity: config.json dims vs spec, shard
    presence (the download scripts' verification role)."""
    p = pathlib.Path(model_dir)
    report = {"dir": str(p), "ok": True, "issues": []}
    cfg_path = p / "config.json"
    if cfg_path.exists():
        cfg = json.loads(cfg_path.read_text())
        checks = {
            "hidden_size": spec.hidden,
            "num_hidden_layers": spec.n_layers,
            "num_attention_heads": spec.n_heads,
            "num_key_value_heads": spec.n_kv_heads,
            "intermediate_size": spec.ffn,
        }
        for key, want in checks.items():
            have = cfg.get(key)
            if have is not None and have != want:
                report["ok"] = False
                report["issues"].append(f"{key}: checkpoint {have} != spec {want}")
    else:
        report["issues"].append("config.json missing (skipping dim check)")
    if not list(p.glob("*.safetensors")):
        report["ok"] = False
        report["issues"].append("no safetensors shards found")
    return report


def load_params(
    model_dir: str,
    spec: ModelSpec,
    *,
    bits: Optional[int] = 8,
    dtype=jnp.bfloat16,
    fuse: bool = True,
) -> Params:
    """Load a Qwen2-style HF checkpoint into the engine's params tree.

    ``bits``: 8/4 quantizes every projection on the fly; None keeps ``dtype``.
    ``fuse``: fuse q/k/v and gate/up per layer BEFORE quantizing (7 -> 4
    projection kernels per layer); staged per-layer so host memory stays
    O(layer), not O(model).
    """
    def _int4_grouped(w, _gs=128):
        gs = _gs if w.shape[0] % _gs == 0 else None
        return quantize_int4(w, group_size=gs)

    quant = {8: quantize_int8, 4: _int4_grouped, None: None}[bits]
    layers: list[dict] = [dict() for _ in range(spec.n_layers)]
    params: Params = {"layers": layers}
    seen = set()
    staging: dict[int, dict] = {}

    def _try_fuse(li: int) -> None:
        st = staging.get(li, {})
        if {"q_proj", "k_proj", "v_proj"} <= st.keys():
            w = jnp.concatenate([st.pop("q_proj"), st.pop("k_proj"), st.pop("v_proj")], axis=1)
            layers[li]["qkv_proj"] = quant(w) if quant else w.astype(dtype)
            if {"q_bias", "k_bias", "v_bias"} <= st.keys():
                layers[li]["qkv_bias"] = jnp.concatenate(
                    [st.pop("q_bias"), st.pop("k_bias"), st.pop("v_bias")], axis=0
                ).astype(dtype)
        if {"gate_proj", "up_proj"} <= st.keys():
            w = jnp.concatenate([st.pop("gate_proj"), st.pop("up_proj")], axis=1)
            layers[li]["gateup_proj"] = quant(w) if quant else w.astype(dtype)

    for name, tensor in _iter_safetensors(pathlib.Path(model_dir)):
        seen.add(name)
        if name == "model.embed_tokens.weight":
            params["embed"] = jnp.asarray(tensor, dtype)
        elif name == "model.norm.weight":
            params["final_norm"] = jnp.asarray(tensor, dtype)
        elif name == "lm_head.weight":
            w = jnp.asarray(tensor.T.copy())
            params["lm_head"] = quant(w) if quant else w.astype(dtype)
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_str, _, suffix = rest.partition(".")
            try:
                li = int(idx_str)
            except ValueError as exc:
                raise ModelLoadError(f"bad layer index in {name}") from exc
            if li >= spec.n_layers:
                continue
            mapped = _LAYER_MAP.get(suffix)
            if mapped is None:
                continue  # rotary inv_freq etc.
            ours, is_matrix = mapped
            fusable = ours in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                               "q_bias", "k_bias", "v_bias")
            if fuse and fusable:
                value = (
                    jnp.asarray(np.ascontiguousarray(tensor.T))
                    if is_matrix
                    else jnp.asarray(tensor)
                )
                staging.setdefault(li, {})[ours] = value
                _try_fuse(li)
            elif is_matrix:
                w = jnp.asarray(np.ascontiguousarray(tensor.T))
                layers[li][ours] = (
                    quant(w) if (quant and ours in QUANTIZABLE) else w.astype(dtype)
                )
            else:
                layers[li][ours] = jnp.asarray(tensor, dtype)

    if "embed" not in params:
        raise ModelLoadError("checkpoint missing model.embed_tokens.weight")
    if "lm_head" not in params:
        if not spec.tie_embeddings:
            raise ModelLoadError("checkpoint missing lm_head.weight for untied spec")
    attn_keys = ("qkv_proj",) if fuse else ("q_proj", "k_proj", "v_proj")
    mlp_keys = ("gateup_proj",) if fuse else ("gate_proj", "up_proj")
    missing = [
        (li, key)
        for li, layer in enumerate(layers)
        for key in (*attn_keys, "o_proj", *mlp_keys, "down_proj",
                    "input_norm", "post_norm")
        if key not in layer
    ]
    if missing:
        raise ModelLoadError(f"checkpoint incomplete; first missing: {missing[:4]}")
    return params


def save_checkpoint(params: Params, spec: ModelSpec, model_dir: str) -> str:
    """Write an UNFUSED float params tree as an HF-format Qwen2 checkpoint
    (config.json + model.safetensors) — the inverse of :func:`load_params`.

    This is how in-environment-trained tiny LMs (models/tiny_train.py,
    scripts/trained_cascade_eval.py) and rehearsal checkpoints
    (scripts/real_smoke.py) enter the PRODUCTION load -> verify -> quantize
    path: everything downstream of a checkpoint directory is identical for
    trained, rehearsal and real HF weights. Reference analog: the HF
    snapshot dirs scripts/download_qwen3_models.py verifies.
    """
    from safetensors.numpy import save_file

    d = pathlib.Path(model_dir)
    d.mkdir(parents=True, exist_ok=True)
    tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    if not spec.tie_embeddings:
        tensors["lm_head.weight"] = np.asarray(
            params["lm_head"], np.float32).T.copy()
    inv_map = {ours: hf for hf, (ours, transpose) in _LAYER_MAP.items()
               if transpose}
    bias_map = {ours: hf for hf, (ours, transpose) in _LAYER_MAP.items()
                if not transpose and ours.endswith("_bias")}
    for li, layer in enumerate(params["layers"]):
        pre = f"model.layers.{li}."
        for ours, hf in inv_map.items():
            tensors[pre + hf] = np.asarray(layer[ours], np.float32).T.copy()
        for ours, hf in bias_map.items():
            if ours in layer:
                tensors[pre + hf] = np.asarray(layer[ours], np.float32)
        tensors[pre + "input_layernorm.weight"] = np.asarray(
            layer["input_norm"], np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_norm"], np.float32)
    save_file(tensors, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "hidden_size": spec.hidden,
        "num_hidden_layers": spec.n_layers,
        "num_attention_heads": spec.n_heads,
        "num_key_value_heads": spec.n_kv_heads,
        "intermediate_size": spec.ffn,
        "vocab_size": spec.vocab_size,
        "head_dim": spec.head_dim,
        "rope_theta": spec.rope_theta,
        "rms_norm_eps": spec.rms_eps,
        "max_position_embeddings": spec.max_seq_len,
        "tie_word_embeddings": spec.tie_embeddings,
    }))
    return str(d)


def save_params_npz(params: Params, path: str) -> None:
    """Flat .npz export of a (possibly quantized) params tree — a simple
    native checkpoint format for quantized weights so the offline
    quantization pass runs once (reference re-quantizes every load)."""
    import jax

    flat = {}

    def visit(prefix, node):
        from ..ops.quant import QuantizedTensor

        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(f"{prefix}.{i}", v)
        elif isinstance(node, QuantizedTensor):
            flat[f"{prefix}#q{node.bits}"] = np.asarray(node.q)
            flat[f"{prefix}#s"] = np.asarray(node.scale)
        else:
            flat[prefix] = np.asarray(node)

    visit("", params)
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, **flat)


def load_params_npz(path: str) -> Params:
    from ..ops.quant import QuantizedTensor

    data = np.load(path)
    root: dict = {}
    pending_scales: dict[str, np.ndarray] = {k[:-2]: data[k] for k in data.files if k.endswith("#s")}

    def insert(tree, parts, value):
        head = parts[0]
        if len(parts) == 1:
            if head.isdigit():
                idx = int(head)
                while len(tree) <= idx:
                    tree.append(None)
                tree[idx] = value
            else:
                tree[head] = value
            return
        nxt_is_list = parts[1].isdigit()
        if head.isdigit():
            idx = int(head)
            while len(tree) <= idx:
                tree.append(None)
            if tree[idx] is None:
                tree[idx] = [] if nxt_is_list else {}
            insert(tree[idx], parts[1:], value)
        else:
            if head not in tree:
                tree[head] = [] if nxt_is_list else {}
            insert(tree[head], parts[1:], value)

    for key in data.files:
        if key.endswith("#s"):
            continue
        if "#q" in key:
            base, bits = key.rsplit("#q", 1)
            value = QuantizedTensor(
                q=jnp.asarray(data[key]),
                scale=jnp.asarray(pending_scales[base]),
                bits=int(bits),
            )
            insert(root, base.split("."), value)
        else:
            insert(root, key.split("."), jnp.asarray(data[key]))
    return root
