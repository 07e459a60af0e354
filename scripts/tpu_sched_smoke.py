#!/usr/bin/env python
"""TPU smoke test for the continuous-batching scheduler graphs.

Runs the lane paths (plain admission, draft/verify admission, multi-step
decode scan, stochastic draft_q acceptance) on the real device with the
Pallas kernel path, asserting greedy outputs equal the fused generate
graphs. The CPU suite covers semantics; this checks the graphs compile and
agree on TPU. Prints one OK line per check.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.engine.scheduler import ContinuousBatchingScheduler
    from adaptive_sd_tpu.models import TINY128, init_params
    from adaptive_sd_tpu.models.qwen import quantize_model

    platform = jax.devices()[0].platform
    use_pallas = platform in ("tpu", "axon")
    print(f"platform={platform} use_pallas={use_pallas}")

    params = quantize_model(init_params(TINY128, jax.random.key(0)), bits=8)
    eng = TierEngine(TINY128, params, page_size=128, n_pages=64,
                     use_pallas=use_pallas)

    prompt = [int(x) for x in np.random.default_rng(0).integers(
        1, TINY128.vocab_size, 24)]
    ref = eng.generate([prompt], max_new=8)[0].token_ids.tolist()
    print("OK fused generate", ref[:4], "...")

    sched = ContinuousBatchingScheduler(eng, max_batch=2, max_context=512)
    r = sched.submit(prompt, max_new=8)
    sched.run_until_idle()
    assert r.out_tokens == ref, (r.out_tokens, ref)
    print("OK plain lane admission + single-step decode")

    bad = list(ref)
    bad[3] = (bad[3] + 1) % (TINY128.vocab_size - 1) + 1
    r = sched.submit(prompt, max_new=8, draft=bad)
    sched.run_until_idle()
    assert r.n_accepted == 3 and r.out_tokens == ref, (r.n_accepted, r.out_tokens)
    print("OK draft (verify) lane admission")

    sched_scan = ContinuousBatchingScheduler(
        eng, max_batch=2, max_context=512, scan_steps=4
    )
    r = sched_scan.submit(prompt, max_new=8)
    sched_scan.run_until_idle()
    assert r.out_tokens == ref, (r.out_tokens, ref)
    print("OK multi-step decode scan")

    sched_q = ContinuousBatchingScheduler(
        eng, max_batch=2, max_context=512, spec_topk=8
    )
    d = sched_q.submit(prompt, max_new=8, temperature=0.7)
    sched_q.run_until_idle()
    dq = (
        np.asarray(d.out_logprobs, np.float32),
        np.stack(d.out_topk_ids),
        np.stack(d.out_topk_probs),
    )
    r = sched_q.submit(prompt, max_new=8, temperature=0.7,
                       draft=d.out_tokens, draft_q=dq)
    sched_q.run_until_idle()
    assert r.n_accepted == 8, r.n_accepted  # p == q: full acceptance
    print("OK stochastic draft_q acceptance (p == q full accept)")
    print("ALL OK")


if __name__ == "__main__":
    main()
