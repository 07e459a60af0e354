#!/usr/bin/env python
"""Measure scheduler serving throughput on the real device: single-step
dispatch vs multi-step decode scans (the tunnel-dispatch amortisation).

Prints one JSON line: tokens/s for scan_steps in {1, 8} at authentic
7B-layer widths (depth 2 — timing is per-dispatch-overhead-bound, which is
exactly what scans amortise).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import dataclasses

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_dev = platform in ("tpu", "axon")
    if on_dev:
        spec = dataclasses.replace(
            scaled_spec(get_spec("qwen2.5-7b"), layers=2, name="schedbench-7b-l2"),
            vocab_size=32768, tie_embeddings=False,
        )
        B, max_new, prompt_len = 8, 64, 128
    else:
        from adaptive_sd_tpu.models import TINY128

        spec = TINY128
        B, max_new, prompt_len = 4, 16, 32

    params = init_params_quantized(spec, jax.random.key(0), bits=8)
    eng = TierEngine(spec, params, page_size=128,
                     n_pages=B * ((prompt_len + max_new) // 128 + 2) + 8,
                     use_pallas=on_dev)
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, spec.vocab_size, prompt_len)]
        for _ in range(B)
    ]

    results = {}
    for scan in (1, 8):
        sched = ContinuousBatchingScheduler(
            eng, max_batch=B, max_context=prompt_len + max_new + 128,
            scan_steps=scan,
        )
        # warm (compiles admission + decode graphs for this mode)
        sched.submit(prompts[0], max_new=4)
        sched.run_until_idle()
        t0 = time.perf_counter()
        reqs = [sched.submit(p, max_new=max_new) for p in prompts]
        sched.run_until_idle()
        dt = time.perf_counter() - t0
        toks = sum(len(r.out_tokens) for r in reqs)
        assert all(r.error is None for r in reqs)
        results[f"scan_{scan}"] = {
            "tokens_per_s": round(toks / dt, 1),
            "wall_s": round(dt, 3),
            "dispatches": sched.steps,
        }
    out = {
        "metric": "scheduler_decode_tokens_per_s",
        "platform": platform,
        "batch": B,
        "max_new": max_new,
        **results,
        "scan_speedup": round(
            results["scan_8"]["tokens_per_s"] / results["scan_1"]["tokens_per_s"], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
