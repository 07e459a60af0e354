#!/usr/bin/env python
"""End-to-end two-tier cascade demo on the current backend.

Runs the full TPU-native loop with synthetic weights:
  draft tier  — fused generation WITH the on-device stopping head
                (inline features -> MLP -> DP; escalation flags ship with
                 the tokens),
  target tier — speculative verify-and-continue for the escalated subset.

Prints per-phase wall times, the escalation decisions, and draft-token
acceptance rates at the verifier. This is BASELINE.json config #3's shape
("two-stage draft/verify cascade") exercised for real.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--lam", type=float, default=0.75)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import get_spec, init_params, scaled_spec
    from adaptive_sd_tpu.models.qwen import fuse_projections, quantize_model
    from adaptive_sd_tpu.ops.matmul_q import on_tpu
    from adaptive_sd_tpu.predict import generate_synthetic
    from adaptive_sd_tpu.predict.inline import (
        policy_from_predictor,
        train_inline_predictor,
    )

    use_pallas = on_tpu()
    vocab = 32768 if use_pallas else 2048
    bases = ("qwen2.5-7b", "qwen2.5-32b") if use_pallas else ("tiny128", "tiny128")
    specs = [
        dataclasses.replace(
            scaled_spec(get_spec(b), layers=2, name=f"bench-t{i}-l2"),
            vocab_size=vocab, tie_embeddings=False,
        )
        for i, b in enumerate(bases)
    ]

    print("training inline stopping head...", file=sys.stderr)
    X, y, _ = generate_synthetic(n_prompts=400, n_stages=2)
    inline = train_inline_predictor(X, y, epochs=15, patience=4)
    policy = policy_from_predictor(
        inline, costs=[1.0, 4.5], priors=[0.7, 0.99], lam=args.lam
    )

    print("building engines (compiles on first run)...", file=sys.stderr)
    engines = []
    for i, spec in enumerate(specs):
        params = quantize_model(fuse_projections(init_params(spec, jax.random.key(i))), bits=8)
        engines.append(
            TierEngine(
                spec, params, page_size=128,
                n_pages=args.batch * ((args.prompt_len + args.max_new) // 128 + 2) + 8,
                use_pallas=use_pallas,
            )
        )

    rng = np.random.default_rng(0)
    prompts = [
        [int(t) for t in rng.integers(1, vocab, args.prompt_len)]
        for _ in range(args.batch)
    ]

    # phase 1: draft with fused on-device stopping
    engines[0].generate_with_policy(prompts, policy, 0, max_new=args.max_new)  # warm
    t0 = time.perf_counter()
    drafts, escalate, p_hat = engines[0].generate_with_policy(
        prompts, policy, 0, max_new=args.max_new
    )
    t_draft = time.perf_counter() - t0

    esc_idx = [i for i, e in enumerate(escalate) if e]
    result = {
        "backend": "tpu" if use_pallas else "cpu",
        "batch": args.batch,
        "draft_wall_s": round(t_draft, 4),
        "draft_tokens_per_s": round(sum(d.num_tokens for d in drafts) / t_draft, 1),
        "p_hat": [round(float(p), 3) for p in p_hat],
        "escalated": len(esc_idx),
    }

    # phase 2: speculative verify for the escalated subset
    if esc_idx:
        sub_prompts = [prompts[i] for i in esc_idx]
        sub_drafts = [drafts[i].token_ids.tolist() or [1] for i in esc_idx]
        engines[1].verify_continue(sub_prompts, sub_drafts, max_new=args.max_new)  # warm
        t0 = time.perf_counter()
        verified = engines[1].verify_continue(sub_prompts, sub_drafts, max_new=args.max_new)
        t_ver = time.perf_counter() - t0
        accs = [n for _, n in verified]
        result.update(
            {
                "verify_wall_s": round(t_ver, 4),
                "accepted_draft_tokens": accs,
                "mean_acceptance_frac": round(
                    float(np.mean([a / max(len(d), 1) for a, d in zip(accs, sub_drafts)])), 3
                ),
            }
        )
    # phase 3: acceptance sanity — the target verifies its OWN greedy drafts.
    # NOTE: with RANDOM weights logits are near-uniform, so bf16 reduction-
    # order differences between the S=128 generate bucket and the larger
    # verify bucket flip argmax a few percent per token (~0.5 acceptance);
    # real peaked logits are robust to this (CPU f32 test asserts exact
    # acceptance, tests/test_engine.py::TestVerifyContinue).
    own = engines[1].generate(prompts, max_new=args.max_new)
    own_drafts = [o.token_ids.tolist() or [1] for o in own]
    engines[1].verify_continue(prompts, own_drafts, max_new=args.max_new)  # warm
    t0 = time.perf_counter()
    self_ver = engines[1].verify_continue(prompts, own_drafts, max_new=args.max_new)
    result["self_verify_wall_s"] = round(time.perf_counter() - t0, 4)
    result["self_acceptance_frac"] = round(
        float(np.mean([n / max(len(d), 1) for (_, n), d in zip(self_ver, own_drafts)])), 3
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
