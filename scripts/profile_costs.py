#!/usr/bin/env python
"""Cost profiling CLI: measure per-tier latency sweeps, fit cost models, and
write calibrated cost ratios back into configs/cascade.yaml.

Role parity: reference ``src/utils/cost_profiler.py`` main
(``python -m src.utils.cost_profiler --config configs/cost_profiling.yaml``).

Modes:
  --mock        size-multiplier synthetic measurements (no device)
  --synthetic   random-weight engines with authentic tier widths (device)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from adaptive_sd_tpu.utils import CostProfiler, MeasurementConfig


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mock", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--write-back", default="", help="cascade yaml to update")
    ap.add_argument("--out", default="results/cost_profile.json")
    args = ap.parse_args()

    tiers = ["qwen2.5-7b", "qwen2.5-14b", "qwen2.5-32b", "qwen2.5-72b"]
    profiler = CostProfiler(MeasurementConfig(repetitions=2, warmup=1))

    if args.mock or not args.synthetic:
        for name, mult in zip(tiers, (1.0, 2.0, 4.5, 10.0)):
            profiler.mock_measurements(name, mult)
    else:
        import dataclasses

        import jax

        from adaptive_sd_tpu.engine import TierEngine
        from adaptive_sd_tpu.models import get_spec, init_params, scaled_spec
        from adaptive_sd_tpu.models.qwen import fuse_projections, quantize_model

        profiler.config = MeasurementConfig(
            input_lens=(64, 128, 256), output_lens=(16, 32), batch_sizes=(1, 4, 8),
            repetitions=2,
        )
        for i, name in enumerate(tiers):
            spec = dataclasses.replace(
                scaled_spec(get_spec(name), layers=2, name=f"prof-{name}"),
                vocab_size=32768, tie_embeddings=False,
            )
            params = quantize_model(fuse_projections(init_params(spec, jax.random.key(i))), bits=8)
            eng = TierEngine(spec, params, n_pages=128, use_pallas=True)

            def run(b, il, ol, eng=eng, spec=spec):
                prompts = [[1] * il for _ in range(b)]
                eng.generate(prompts, max_new=ol)

            profiler.profile_tier(name, run)
            del eng, params

    models = {t: vars(profiler.fit_cost_model(t)) for t in tiers}
    ratios = profiler.cost_ratios(tiers)
    profiler.save_results(args.out)
    print(json.dumps({"cost_ratios": ratios,
                      "models": {t: {k: m[k] for k in ("kind", "r2", "per_token_s")}
                                 for t, m in models.items()}}, indent=1))
    if args.write_back:
        profiler.write_back_costs(args.write_back, tiers)
        print(f"updated {args.write_back} (backup written)")


if __name__ == "__main__":
    main()
