#!/usr/bin/env python
"""Start the cascade HTTP server.

Role parity: reference ``src/serving/server.py`` main + ``run.sh serve``.
Modes:
  --mock           mock stages (no weights) — demo-server parity
  --synthetic      random-weight tiny engines on the current backend
  default          real weights from --cascade-config stage weights_path

Usage:
  python scripts/serve.py --mock --port 8000
  python scripts/serve.py --cascade-config configs/cascade.yaml
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from adaptive_sd_tpu.cascade import (
    AdaptiveCascadePipeline,
    EngineTextStage,
    MockStage,
    PipelineConfig,
    StageManager,
)
from adaptive_sd_tpu.cascade.cost_optimizer import DynamicCostOptimizer, OptimizerTargets
from adaptive_sd_tpu.config import ConfigManager, ServingConfig
from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic
from adaptive_sd_tpu.serve import run_server
from adaptive_sd_tpu.utils import setup_logging


def _mock_stages() -> StageManager:
    return StageManager(
        [
            MockStage("7b", cost_per_token=1.0, capacity=0.55),
            MockStage("14b", cost_per_token=2.0, capacity=0.7),
            MockStage("32b", cost_per_token=4.5, capacity=0.85),
            MockStage("72b", cost_per_token=10.0, capacity=0.97),
        ]
    )


def _synthetic_stages(prefix_spill_bytes: int = 0) -> StageManager:
    import jax

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import TINY128, init_params, scaled_spec
    from adaptive_sd_tpu.models.qwen import fuse_projections, quantize_model

    def simple_tok(text: str) -> list[int]:
        return [(ord(c) % (TINY128.vocab_size - 1)) + 1 for c in text[:256]]

    def simple_detok(ids) -> str:
        return " ".join(str(i) for i in ids)

    stages = []
    for i, (name, layers, cost) in enumerate(
        [("tiny-a", 2, 1.0), ("tiny-b", 4, 2.2), ("tiny-c", 8, 4.8)]
    ):
        import dataclasses

        spec = dataclasses.replace(scaled_spec(TINY128, layers=layers, name=name))
        params = quantize_model(fuse_projections(init_params(spec, jax.random.key(i))), bits=8)
        eng = TierEngine(spec, params, n_pages=256, use_pallas=False, cost_per_token=cost,
                         enable_prefix_cache=True,
                         prefix_spill_bytes=prefix_spill_bytes)
        stages.append(EngineTextStage(eng, simple_tok, simple_detok, name=name,
                                      spec_topk=0 if i == 2 else 64))
    return StageManager(stages)


def _real_stages(cascade_cfg_path: str, prefix_spill_bytes: int = 0) -> StageManager:
    import yaml

    from adaptive_sd_tpu.config import CascadeConfig
    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec
    from adaptive_sd_tpu.models.loader import load_params

    cfg = CascadeConfig.from_dict(
        yaml.safe_load(pathlib.Path(cascade_cfg_path).read_text())
    )
    try:
        from transformers import AutoTokenizer
    except ImportError as exc:
        raise SystemExit(f"transformers needed for real serving: {exc}")

    stages = []
    for si, st in enumerate(cfg.stages):
        is_last = si == len(cfg.stages) - 1
        if not st.weights_path:
            raise SystemExit(
                f"stage {st.name}: weights_path empty — use --mock/--synthetic "
                "or point weights_path at an HF checkpoint dir"
            )
        spec = get_spec(st.spec)
        params = load_params(st.weights_path, spec, bits=st.bits)
        tok = AutoTokenizer.from_pretrained(st.weights_path)
        eng = TierEngine(
            spec,
            params,
            name=st.name,
            page_size=st.page_size,
            n_pages=st.n_pages,
            eos_id=tok.eos_token_id,
            cost_per_token=st.cost_per_token,
            enable_prefix_cache=st.prefix_cache,
            prefix_spill_bytes=prefix_spill_bytes if st.prefix_cache else 0,
        )
        stages.append(
            EngineTextStage(
                eng,
                lambda s, t=tok: t.encode(s),
                lambda ids, t=tok: t.decode(list(ids), skip_special_tokens=True),
                name=st.name,
                cost_per_token=st.cost_per_token,
                # final tier's outputs are never verified downstream
                spec_topk=0 if is_last else 64,
            )
        )
    return StageManager(stages)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mock", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--config-dir", default="configs")
    ap.add_argument("--cascade-config", default="configs/cascade.yaml")
    ap.add_argument("--predictor", default="", help="predictor .npz (default: train on synthetic)")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--host", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument(
        "--scheduled", action="store_true",
        help="continuous-batching execution plane (per-tier lane schedulers "
        "with draft-verify escalation admission; engine-backed stages only)",
    )
    ap.add_argument(
        "--replicas", type=int, default=1,
        help="data-parallel cascade replicas behind a least-loaded router "
        "(cross-host serving topology: one replica per host slice, DCN "
        "carries only requests — cascade/router.py)",
    )
    args = ap.parse_args()

    setup_logging("INFO")
    serving = ConfigManager(args.config_dir).load("serving", ServingConfig)
    host = args.host or serving.server.host
    port = args.port or serving.server.port

    # ServerConfig.prefix_spill_mb drives the engines' host-spill budget for
    # evicted prefix-cache pages (0 disables CPU KV offload).
    spill_bytes = max(int(serving.server.prefix_spill_mb), 0) << 20

    def build_stages():
        if args.mock:
            return _mock_stages()
        if args.synthetic:
            return _synthetic_stages(spill_bytes)
        return _real_stages(args.cascade_config, spill_bytes)

    stages = build_stages()

    if args.predictor:
        if args.predictor.endswith(".pkl"):
            from adaptive_sd_tpu.predict import EnsembleQualityPredictor

            predictor = EnsembleQualityPredictor.load(args.predictor)
        else:
            predictor = MLPQualityPredictor.load(args.predictor)
    else:
        X, y, _ = generate_synthetic(n_prompts=500, n_stages=len(stages))
        predictor = MLPQualityPredictor(n_stages=len(stages))
        predictor.fit(X, y, epochs=20, patience=5)

    pcfg = PipelineConfig(
        lam=serving.optimization.lambda_value,
        strategy=serving.optimization.strategy,
        risk_alpha=serving.optimization.risk_alpha,
        risk_beta=serving.optimization.risk_beta,
        enable_caching=serving.cache.enable,
        max_concurrent=serving.server.max_concurrent,
        cache_ttl_s=serving.cache.ttl_s,
        cache_max_bytes=serving.cache.max_bytes,
    )
    def make_pipeline(stage_set):
        if args.scheduled or serving.server.scheduled_batching:
            from adaptive_sd_tpu.cascade import ScheduledCascadePipeline

            return ScheduledCascadePipeline(
                stage_set,
                predictor,
                pcfg,
                max_batch=serving.server.max_batch_lanes,
                max_context=serving.server.max_context,
                scan_steps=serving.server.decode_scan_steps,
                preemption_mode=serving.server.preemption_mode,
            )
        return AdaptiveCascadePipeline(stage_set, predictor, pcfg)

    if args.replicas > 1:
        from adaptive_sd_tpu.cascade import ReplicaRouter

        # replica 0 reuses the stages built above; the rest build their own
        # engines (in production each lives on its host's mesh slice)
        pipeline = ReplicaRouter(
            [make_pipeline(stages)]
            + [make_pipeline(build_stages()) for _ in range(args.replicas - 1)]
        )
    else:
        pipeline = make_pipeline(stages)
    # Online dual-ascent lambda controller: holds mean observed quality ON
    # the configured gate by adapting lambda per completed request
    # (cost_optimizer.QualityGateController; 0 disables).
    if getattr(serving.optimization, "quality_gate_target", 0.0) > 0.0:
        from adaptive_sd_tpu.cascade import QualityGateController

        QualityGateController(
            serving.optimization.quality_gate_target,
            lam0=serving.optimization.lambda_value,
            lr=serving.optimization.quality_gate_lr,
        ).attach(pipeline)
        if serving.optimization.enable_dynamic_cost:
            # attach() marks the pipeline; DynamicCostOptimizer sees the mark
            # and yields lambda actuation (keeping its cost-multiplier role)
            # so the two controllers never fight over the dual variable.
            print(
                "NOTE: quality_gate_target set with enable_dynamic_cost — "
                "the gate controller owns lambda; DynamicCostOptimizer will "
                "only adapt per-stage cost multipliers.",
                file=sys.stderr,
            )
    optimizer = None
    if serving.optimization.enable_dynamic_cost:
        optimizer = DynamicCostOptimizer(
            pipeline,
            OptimizerTargets(
                target_latency_s=serving.optimization.target_latency_s,
                max_error_rate=serving.optimization.max_error_rate,
                min_quality=serving.optimization.min_quality,
            ),
            interval_s=serving.optimization.reoptimize_interval_s,
        )
        optimizer.start()
    try:
        run_server(pipeline, host=host, port=port, warmup=not args.no_warmup)
    finally:
        if optimizer:
            optimizer.stop()


if __name__ == "__main__":
    main()
