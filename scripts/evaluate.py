#!/usr/bin/env python
"""Lambda-sweep evaluation (in-process or against a live server).

Role parity: reference ``experiments/evaluate_pipeline.py`` +
``experiments/run_full_evaluation.sh``. In-process mode drives an
AdaptiveCascadePipeline directly; --server mode drives a live HTTP endpoint
through /update_lambda, /reset_stats, /generate (SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from adaptive_sd_tpu.evalx import (
    ComprehensiveQualityEvaluator,
    LambdaSweepHarness,
    synthetic_dataset,
)
from adaptive_sd_tpu.utils import setup_logging


def in_process_sweep(args) -> None:
    from adaptive_sd_tpu.cascade import (
        AdaptiveCascadePipeline,
        MockStage,
        PipelineConfig,
        StageManager,
    )
    from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic

    X, y, _ = generate_synthetic(n_prompts=600)
    pred = MLPQualityPredictor()
    pred.fit(X, y, epochs=20, patience=5)
    if args.scheduled:
        # lambda sweep through the continuous-batching execution plane
        # (engine-backed tiny tiers; mock stages have no lanes)
        import dataclasses

        import jax

        from adaptive_sd_tpu.cascade import EngineTextStage, ScheduledCascadePipeline
        from adaptive_sd_tpu.engine import TierEngine
        from adaptive_sd_tpu.models import TINY128, init_params, scaled_spec

        def tok(text):
            return [(ord(c) % (TINY128.vocab_size - 1)) + 1 for c in text[:128]] or [1]

        def detok(ids):
            return " ".join(str(int(i)) for i in ids)

        stages = []
        for i, (name, layers, cost) in enumerate(
            [("tiny-a", 2, 1.0), ("tiny-b", 4, 2.2), ("tiny-c", 8, 4.8)]
        ):
            spec = dataclasses.replace(scaled_spec(TINY128, layers=layers, name=name))
            params = init_params(spec, jax.random.key(i))
            eng = TierEngine(spec, params, n_pages=256, use_pallas=False,
                             cost_per_token=cost)
            stages.append(EngineTextStage(eng, tok, detok, name=name,
                                          cost_per_token=cost))
        pipe = ScheduledCascadePipeline(
            StageManager(stages), pred, PipelineConfig(enable_caching=False)
        )
    else:
        pipe = AdaptiveCascadePipeline(
            StageManager(
                [
                    MockStage("7b", cost_per_token=1.0, capacity=0.55),
                    MockStage("14b", cost_per_token=2.0, capacity=0.7),
                    MockStage("32b", cost_per_token=4.5, capacity=0.85),
                    MockStage("72b", cost_per_token=10.0, capacity=0.97),
                ]
            ),
            pred,
            PipelineConfig(enable_caching=False),
        )
    harness = LambdaSweepHarness(pipe)
    try:
        harness.run(
            lambdas=args.lambdas, datasets=args.datasets,
            n_per_dataset=args.n_per_dataset,
        )
    finally:
        pipe.shutdown()
    harness.save(args.out)
    print(json.dumps(harness.summary(), indent=1))


async def server_sweep(args) -> None:
    import aiohttp

    evaluator = ComprehensiveQualityEvaluator()
    results = []
    async with aiohttp.ClientSession(base_url=args.server) as session:
        async with session.get("/health") as r:
            assert r.status == 200, "server unhealthy"
        for dataset in args.datasets:
            from adaptive_sd_tpu.evalx.sweep import load_dataset

            samples, _frozen = load_dataset(dataset, args.n_per_dataset)
            for lam in args.lambdas:
                await session.post("/update_lambda", json={"lambda_value": lam})
                await session.post("/reset_stats")
                lats, quals = [], []
                for s in samples:
                    async with session.post(
                        "/generate", json={"prompt": s.prompt, "max_tokens": 64}
                    ) as r:
                        body = await r.json()
                    if r.status != 200:
                        continue
                    lats.append(body["latency_s"])
                    quals.append(
                        evaluator.evaluate(body["text"], s.reference, s.task).aggregate
                    )
                async with session.get("/stats") as r:
                    stats = await r.json()
                results.append(
                    {
                        "lambda": lam,
                        "dataset": dataset,
                        "avg_latency_s": float(np.mean(lats)) if lats else 0.0,
                        "p95_latency_s": float(np.percentile(lats, 95)) if lats else 0.0,
                        "avg_quality": float(np.mean(quals)) if quals else 0.0,
                        "server_stats": stats,
                    }
                )
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out} ({len(results)} sweep points)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--server", default="", help="http://host:port for live-server mode")
    ap.add_argument("--lambdas", type=float, nargs="+",
                    default=[0.1, 0.5, 1.0, 2.0, 5.0, 10.0])
    ap.add_argument("--datasets", nargs="+",
                    default=["mmlu-style", "gsm8k-style"])
    ap.add_argument("--n-per-dataset", type=int, default=30)
    ap.add_argument(
        "--scheduled", action="store_true",
        help="sweep through the continuous-batching plane (engine-backed "
        "tiny tiers) instead of mock stages",
    )
    ap.add_argument("--out", default="results/lambda_sweep.json")
    args = ap.parse_args()

    setup_logging("INFO")
    if args.server:
        asyncio.run(server_sweep(args))
    else:
        in_process_sweep(args)


if __name__ == "__main__":
    main()
