#!/usr/bin/env python
"""One-command real-weight smoke: safetensors dir(s) -> cascade -> quality report.

Role parity: the reference's real-model rehearsal — load checkpoints, build
the cascade, calibrate costs, score REAL datasets
(``src/serving/real_model_pipeline.py:240-443`` +
``experiments/evaluate_pipeline.py:115-188``). This runs the moment a
checkpoint directory exists (VERDICT round-1 #3):

    python scripts/real_smoke.py --stages /ckpts/qwen7b /ckpts/qwen32b \
        --bits 8 4 --datasets factual-qa gsm-style --out results/smoke.json

Every stage dir needs config.json + *.safetensors (spec is INFERRED from
config.json — no hand-registered spec required) and, ideally, a tokenizer
(falls back to a byte-level tokenizer with a warning, which destroys quality
on real checkpoints — install tokenizer files for a meaningful score).

``--rehearse`` exercises the IDENTICAL path end-to-end without real weights:
it synthesizes tiny Qwen2-architecture safetensors checkpoints on disk,
then runs the same load -> verify -> quantize -> engine -> cascade ->
dataset-scoring flow. The report marks itself rehearsal so nobody mistakes
its quality numbers for real-model quality.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from adaptive_sd_tpu.utils import setup_logging


def _byte_tokenizer(vocab_size: int):
    def tok(text: str) -> list[int]:
        return [(b % (vocab_size - 1)) + 1 for b in text.encode()[:512]] or [1]

    def detok(ids) -> str:
        return " ".join(str(int(i)) for i in ids)

    return tok, detok


def _hf_tokenizer(model_dir: str):
    try:
        from transformers import AutoTokenizer

        t = AutoTokenizer.from_pretrained(model_dir)
        return (
            lambda s: t.encode(s),
            lambda ids: t.decode(list(ids), skip_special_tokens=True),
            t.eos_token_id,
        )
    except Exception:
        return None


def _write_rehearsal_checkpoints(base: pathlib.Path, n_stages: int) -> list[str]:
    """Synthesize tiny Qwen2-architecture HF checkpoints of increasing depth."""
    import dataclasses

    import jax
    from safetensors.numpy import save_file

    from adaptive_sd_tpu.models import TINY, init_params, scaled_spec

    dirs = []
    for si in range(n_stages):
        spec = dataclasses.replace(
            scaled_spec(TINY, layers=2 * (si + 1), name=f"rehearsal-{si}")
        )
        params = init_params(spec, jax.random.key(si), dtype=np.float32)
        d = base / f"stage{si}"
        d.mkdir(parents=True, exist_ok=True)
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
            pre = f"model.layers.{li}."
            for ours, hf in name_map.items():
                tensors[pre + hf] = np.asarray(layer[ours], np.float32).T.copy()
            for ours, hf in [
                ("q_bias", "self_attn.q_proj.bias"),
                ("k_bias", "self_attn.k_proj.bias"),
                ("v_bias", "self_attn.v_proj.bias"),
            ]:
                tensors[pre + hf] = np.asarray(layer[ours], np.float32)
            tensors[pre + "input_layernorm.weight"] = np.asarray(
                layer["input_norm"], np.float32
            )
            tensors[pre + "post_attention_layernorm.weight"] = np.asarray(
                layer["post_norm"], np.float32
            )
        save_file(tensors, str(d / "model.safetensors"))
        (d / "config.json").write_text(
            json.dumps(
                {
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
                }
            )
        )
        dirs.append(str(d))
    return dirs


def build_cascade(stage_dirs, bits_list, *, use_pallas: bool, n_pages: int = 512):
    """checkpoint dirs -> StageManager of real engines (spec inferred)."""
    from adaptive_sd_tpu.cascade import EngineTextStage, StageManager
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models.loader import (
        load_params,
        spec_from_checkpoint,
        verify_checkpoint,
    )

    stages = []
    reports = []
    for si, (d, bits) in enumerate(zip(stage_dirs, bits_list)):
        spec = spec_from_checkpoint(d)
        rep = verify_checkpoint(d, spec)
        reports.append(rep)
        if not rep["ok"]:
            raise SystemExit(f"checkpoint {d} failed verification: {rep['issues']}")
        params = load_params(d, spec, bits=bits)
        hf_tok = _hf_tokenizer(d)
        if hf_tok is not None:
            tok, detok, eos = hf_tok
        else:
            print(f"WARNING: no tokenizer in {d}; byte-level fallback", file=sys.stderr)
            tok, detok = _byte_tokenizer(spec.vocab_size)
            eos = None
        eng = TierEngine(
            spec,
            params,
            name=spec.name,
            n_pages=n_pages,
            use_pallas=use_pallas,
            eos_id=eos,
            enable_prefix_cache=True,
        )
        is_last = si == len(stage_dirs) - 1
        stages.append(
            EngineTextStage(
                eng, tok, detok, name=spec.name, stage_index=si,
                spec_topk=0 if is_last else 64,
            )
        )
    return StageManager(stages), reports


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", nargs="+", default=[],
                    help="checkpoint dirs, smallest tier first")
    ap.add_argument("--bits", nargs="+", type=int, default=None,
                    help="per-stage quant bits (default: 8 for all but last, 4 last)")
    ap.add_argument("--rehearse", action="store_true",
                    help="synthesize tiny checkpoints and run the identical path")
    ap.add_argument("--datasets", nargs="+", default=["factual-qa", "gsm-style"])
    ap.add_argument("--n", type=int, default=None, help="items per dataset (default all)")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--lam", type=float, default=1.0)
    ap.add_argument("--predictor", default="", help="trained predictor .npz (default: synthetic)")
    ap.add_argument("--pallas", action="store_true",
                    help="Pallas kernels (default: off — rehearsal runs on CPU)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the session env pins jax to "
                    "the tunneled TPU; rehearsal runs fine on CPU)")
    ap.add_argument("--out", default="results/real_smoke.json")
    args = ap.parse_args()

    if args.cpu or (args.rehearse and not args.pallas):
        import jax

        jax.config.update("jax_platforms", "cpu")

    setup_logging("INFO")
    t0 = time.time()

    if args.rehearse and not args.stages:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="adaptive_sd_rehearsal_")
        args.stages = _write_rehearsal_checkpoints(pathlib.Path(tmp), 3)
    if not args.stages:
        raise SystemExit("pass --stages DIR... or --rehearse")
    bits = args.bits or [8] * (len(args.stages) - 1) + [4]
    if len(bits) != len(args.stages):
        raise SystemExit("--bits length must match --stages")

    stages, ckpt_reports = build_cascade(args.stages, bits, use_pallas=args.pallas)

    from adaptive_sd_tpu.cascade import (
        AdaptiveCascadePipeline,
        PipelineConfig,
        calibrate_costs,
    )
    from adaptive_sd_tpu.core.types import RequestContext
    from adaptive_sd_tpu.evalx.datasets import load_frozen, score_item
    from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic

    if args.predictor:
        predictor = MLPQualityPredictor.load(args.predictor)
    else:
        X, y, _ = generate_synthetic(n_prompts=400, n_stages=len(stages))
        predictor = MLPQualityPredictor(n_stages=len(stages))
        predictor.fit(X, y, epochs=20, patience=5)

    pipeline = AdaptiveCascadePipeline(
        stages, predictor, PipelineConfig(lam=args.lam)
    )
    measured_ratios = calibrate_costs(pipeline, max_new=16)

    report = {
        "mode": "rehearsal" if args.rehearse else "real",
        "stages": args.stages,
        "bits": bits,
        "checkpoints": ckpt_reports,
        "measured_cost_ratios": [round(r, 3) for r in measured_ratios],
        "lambda": args.lam,
        "datasets": {},
    }
    n_stages = len(stages)
    for name in args.datasets:
        items = load_frozen(name)
        if args.n:
            items = items[: args.n]
        casc_scores, fixed_scores, stage_counts, lat = [], [], [0] * n_stages, []
        for i, it in enumerate(items):
            res = pipeline.process_request(
                RequestContext(prompt=it["prompt"], request_id=f"{name}-{i}",
                               max_tokens=args.max_tokens)
            )
            casc_scores.append(score_item(it, res.text))
            stage_counts[res.final_stage] += 1
            lat.append(res.total_latency_s)
            fixed = stages[n_stages - 1].generate_text(
                [it["prompt"]], max_new=args.max_tokens
            )[0]
            fixed_scores.append(score_item(it, fixed.text))
        n = len(items)
        casc_acc = sum(casc_scores) / n
        fixed_acc = sum(fixed_scores) / n
        report["datasets"][name] = {
            "n": n,
            "cascade_accuracy": round(casc_acc, 4),
            "fixed_largest_accuracy": round(fixed_acc, 4),
            "quality_preservation": round(casc_acc / fixed_acc, 4)
            if fixed_acc > 0 else None,
            "stage_distribution": [round(c / n, 3) for c in stage_counts],
            "p50_latency_s": round(float(np.percentile(lat, 50)), 4),
            "p95_latency_s": round(float(np.percentile(lat, 95)), 4),
        }
    report["wall_s"] = round(time.time() - t0, 1)

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
