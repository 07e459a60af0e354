#!/usr/bin/env python
"""Measure per-layer decode step time per tier width x weight format.

Decides the production decode format per cascade tier (VERDICT round-1 #2:
W8A8 / INT4 on the large tiers). Same depth-differencing methodology as
bench.py: each (width, format) measured at depths (2, 6); per-layer time is
the slope, immune to fixed prefill/dispatch overhead.

Prints one JSON line per (tier, format) and a final summary line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, scaled_spec
    from adaptive_sd_tpu.models.qwen import init_params_quantized

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if on_tpu:
        depths, vocab, B, max_new, prompt_len, reps = (2, 6), 32768, 8, 48, 128, 8
        tier_bases = ["qwen2.5-7b", "qwen2.5-32b", "qwen2.5-72b"]
    else:
        depths, vocab, B, max_new, prompt_len, reps = (2, 4), 2048, 4, 8, 32, 3
        tier_bases = ["tiny128", "tiny128"]

    # format name -> (bits, act_quant)
    formats = {
        "int8": (8, False),
        "w8a8": (8, True),
        "int4": (4, False),
    }

    prompts = [
        [int(x) for x in np.random.default_rng(i).integers(1, vocab, prompt_len)]
        for i in range(B)
    ]
    summary: dict[str, dict[str, float]] = {}
    for ti, base in enumerate(tier_bases):
        spec0 = get_spec(base)
        summary[base] = {}
        for fmt, (bits, act_quant) in formats.items():
            dec = {}
            for L in depths:
                spec = dataclasses.replace(
                    scaled_spec(spec0, layers=L, name=f"qfb-{ti}-{fmt}-l{L}"),
                    vocab_size=vocab, tie_embeddings=False,
                )
                params = init_params_quantized(spec, jax.random.key(ti), bits=bits)
                eng = TierEngine(
                    spec, params, page_size=128,
                    n_pages=B * ((prompt_len + max_new) // 128 + 2) + 8,
                    use_pallas=on_tpu, act_quant=act_quant,
                )

                def timed(fn):
                    fn()
                    best = float("inf")
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        fn()
                        best = min(best, time.perf_counter() - t0)
                    return best

                gen_wall = timed(lambda: eng.generate(prompts, max_new=max_new))
                gen_one = timed(lambda: eng.generate(prompts, max_new=1))
                dec[L] = max((gen_wall - gen_one) / (max_new - 1), 1e-6)
                del eng, params
            d_lo, d_hi = depths
            layer_ms = max((dec[d_hi] - dec[d_lo]) / (d_hi - d_lo), 0.0) * 1e3
            summary[base][fmt] = round(layer_ms, 4)
            print(json.dumps({"tier": base, "format": fmt,
                              "per_layer_decode_ms": round(layer_ms, 4),
                              "step_ms_by_depth": {str(k): round(v * 1e3, 3)
                                                   for k, v in dec.items()}}),
                  flush=True)

    print(json.dumps({"summary_per_layer_ms": summary, "platform": platform,
                      "B": B, "max_new": max_new}), flush=True)


if __name__ == "__main__":
    main()
