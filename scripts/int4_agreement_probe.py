#!/usr/bin/env python
"""INT4-vs-INT8 greedy-agreement on TRAINED (structured) weights.

Why this exists: the bench's mixed-INT4 row bills its quality against a
measured int4-vs-int8 verify-prefix agreement, but on RANDOM weights that
agreement is ~0 at the big tiers — random logits are near-ties, so any
quantization perturbation flips the argmax (VERDICT r3 weak #7: the row is
vacuous as published). Real checkpoints are different: training creates
top-1 logit MARGINS, and a token only flips when the quantization-induced
logit perturbation exceeds its margin. This probe makes that statement with
measurements instead of hand-waving:

1. Train a tiny Qwen-architecture LM (models/config.TINY128, the spec whose
   head_dim satisfies the Pallas lane constraints) on a sparse-Markov
   corpus until it has real margins — a next-token task with 2-4 plausible
   successors per token, skewed, so the trained model is confident exactly
   the way a real LM is on its modal continuations.
2. Quantize the SAME trained weights to int8 and int4
   (models/qwen.quantize_model — the production offline-quantization path,
   reference analog: the AWQ checkpoints configs/qwen3_models.yaml uses).
3. Measure greedy agreement the way the engine actually uses it: the int4
   twin verifies the int8 twin's greedy draft with
   TierEngine.verify_continue — accepted-prefix fraction = the speculative
   acceptance rate the mixed cascade would see.
4. Report the margin distribution and the per-token logit perturbation so
   the result transfers: expected agreement for ANY checkpoint is
   P(margin > perturbation), both measured here.
5. Control: the same measurement on untrained (random) twins of the same
   shape — reproducing the bench's pessimistic ~0 bound, demonstrating that
   the collapse is a property of margin-free random weights, not of int4.

CPU-safe (~2-4 min); writes AGREEMENT.json for bench.py to cite.

Usage: python scripts/int4_agreement_probe.py --out AGREEMENT.json
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--out", default="AGREEMENT.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from adaptive_sd_tpu.engine import TierEngine
    from adaptive_sd_tpu.models import TINY128
    from adaptive_sd_tpu.models.qwen import (
        apply_rope,
        fuse_projections,
        init_params,
        quantize_model,
        rms_norm,
        rope_tables,
    )

    t0 = time.time()
    spec = TINY128
    V = spec.vocab_size

    # --- sparse-Markov corpus: 2-4 plausible successors per token, skewed --
    rng = np.random.default_rng(args.seed)
    n_succ = rng.integers(2, 5, size=V)
    succ = rng.integers(0, V, size=(V, 4))
    # skewed successor probs: modal continuation dominates (real-LM-like)
    base_p = np.asarray([0.7, 0.2, 0.07, 0.03])

    def sample_seq(r: np.random.Generator, length: int) -> np.ndarray:
        out = np.empty(length, np.int64)
        t = int(r.integers(0, V))
        for i in range(length):
            out[i] = t
            k = n_succ[t]
            p = base_p[:k] / base_p[:k].sum()
            t = int(succ[t, r.choice(k, p=p)])
        return out

    def batch(r: np.random.Generator):
        return np.stack([sample_seq(r, args.seq + 1) for _ in range(args.batch)])

    # --- minimal training forward (same param structure init_params emits;
    # the trained weights then flow through the PRODUCTION fuse+quantize+
    # engine path — this forward exists only to produce gradients) ---------
    import math

    sm_scale = 1.0 / math.sqrt(spec.head_dim)

    def forward(params, tokens):  # [B, S] -> logits [B, S, V]
        B, S = tokens.shape
        h = params["embed"][tokens]
        pos = jnp.arange(S)[None, :].repeat(B, axis=0)
        cos, sin = rope_tables(pos, spec.head_dim, spec.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        mask = jnp.tril(jnp.ones((S, S), bool))
        for layer in params["layers"]:
            x = rms_norm(h, layer["input_norm"], spec.rms_eps)
            q = (x @ layer["q_proj"] + layer["q_bias"]).reshape(
                B, S, spec.n_heads, spec.head_dim)
            k = (x @ layer["k_proj"] + layer["k_bias"]).reshape(
                B, S, spec.n_kv_heads, spec.head_dim)
            v = (x @ layer["v_proj"] + layer["v_bias"]).reshape(
                B, S, spec.n_kv_heads, spec.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            rep = spec.n_heads // spec.n_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm_scale
            att = jnp.where(mask[None, None], att, -1e30)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, S, -1)
            h = h + o @ layer["o_proj"]
            x = rms_norm(h, layer["post_norm"], spec.rms_eps)
            g = jax.nn.silu(x @ layer["gate_proj"]) * (x @ layer["up_proj"])
            h = h + g @ layer["down_proj"]
        h = rms_norm(h, params["final_norm"], spec.rms_eps)
        return h @ params["lm_head"]

    def loss_fn(params, tokens):
        logits = forward(params, tokens[:, :-1])
        tgt = tokens[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()

    params = init_params(spec, jax.random.key(args.seed), dtype=jnp.float32)
    tx = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, toks):
        l, g = jax.value_and_grad(loss_fn)(p, toks)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    loss = float("nan")
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch(rng)))
        if i % 100 == 0:
            print(f"[probe +{time.time()-t0:5.1f}s] step {i} loss {float(loss):.3f}",
                  file=sys.stderr, flush=True)
    final_loss = float(loss)
    # corpus entropy floor: H(successor) averaged — the trained model is
    # "converged" when loss approaches it
    ent = 0.0
    for t in range(V):
        k = n_succ[t]
        p = base_p[:k] / base_p[:k].sum()
        ent -= float((p * np.log(p)).sum())
    ent /= V

    def quant_roundtrip(params_f32, bits: int):
        """Quantize->dequantize the quantizable projections, keeping the
        float forward usable — isolates the quantization perturbation."""
        from adaptive_sd_tpu.ops.quant import (
            dequantize,
            quantize_int4,
            quantize_int8,
        )

        def rt(w):
            w = jnp.asarray(w, jnp.float32)
            if bits == 4:
                gs = 128 if w.shape[0] % 128 == 0 else None
                t = quantize_int4(w, group_size=gs)
            else:
                t = quantize_int8(w)
            return dequantize(t, jnp.float32)

        out = {k: v for k, v in params_f32.items() if k != "layers"}
        out["layers"] = []
        quant_keys = ("q_proj", "k_proj", "v_proj", "o_proj",
                      "gate_proj", "up_proj", "down_proj")
        for layer in params_f32["layers"]:
            out["layers"].append({
                k: (rt(v) if k in quant_keys else v) for k, v in layer.items()
            })
        return out

    def measure(params_f32, tag: str) -> dict:
        """int8/int4 twins of the SAME weights -> greedy agreement, plus the
        margin-vs-perturbation statistics that make the number transfer to
        any checkpoint (agreement ~= P(top-1 margin > logit perturbation))."""
        fused = fuse_projections(jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), params_f32))
        p8 = quantize_model(fused, bits=8)
        p4 = quantize_model(fused, bits=4)
        eng8 = TierEngine(spec, p8, page_size=16, n_pages=768, use_pallas=False)
        eng4 = TierEngine(spec, p4, page_size=16, n_pages=768, use_pallas=False)
        r = np.random.default_rng(args.seed + 1)
        prompts = [sample_seq(r, 32).tolist() for _ in range(args.n_eval)]
        fracs = []
        for i in range(0, len(prompts), 8):
            chunk = prompts[i : i + 8]
            outs = eng8.generate(chunk, max_new=args.max_new)
            drafts = [o.token_ids.tolist() or [1] for o in outs]
            vouts = eng4.verify_continue(chunk, drafts, max_new=args.max_new)
            fracs += [n_acc / max(len(d), 1)
                      for (_, n_acc), d in zip(vouts, drafts)]
        del eng8, eng4, p8, p4
        # margin + perturbation via the float forward: top-1 minus top-2
        # logit gap on the exact (f32) weights, and the logit change induced
        # by the int8->int4 quantization round-trip at the same positions
        toks = jnp.asarray(np.stack(
            [sample_seq(r, args.seq) for _ in range(8)]))
        lg_exact = np.asarray(forward(params_f32, toks), np.float64)
        lg_q4 = np.asarray(
            forward(quant_roundtrip(params_f32, 4), toks), np.float64)
        top2 = np.partition(lg_exact, -2, axis=-1)[..., -2:]
        margins = (top2[..., 1] - top2[..., 0]).ravel()
        top_idx = lg_exact.argmax(-1)
        perturb = np.abs(
            np.take_along_axis(lg_q4 - lg_exact, top_idx[..., None], -1)
        ).ravel()
        return {
            "tag": tag,
            "mean_agreement": round(float(np.mean(fracs)), 4),
            "median_agreement": round(float(np.median(fracs)), 4),
            "n_prompts": args.n_eval,
            "draft_len": args.max_new,
            "top1_margin_nats_median": round(float(np.median(margins)), 3),
            "int4_logit_perturb_median": round(float(np.median(perturb)), 3),
            "frac_margin_above_perturb": round(
                float(np.mean(margins > np.median(perturb))), 3),
        }

    trained = measure(params, "trained")
    control = measure(
        init_params(spec, jax.random.key(args.seed + 7), dtype=jnp.float32),
        "random-control",
    )

    out = {
        "metric": "int4_vs_int8_greedy_agreement",
        "spec": spec.name,
        "train_steps": args.steps,
        "final_loss_nats": round(final_loss, 4),
        "corpus_entropy_floor_nats": round(ent, 4),
        "trained": trained,
        "random_control": control,
        "note": (
            "agreement = accepted-prefix fraction when the int4 twin "
            "verifies the int8 twin's greedy draft (the engine's speculative "
            "acceptance rule). Trained weights have real top-1 margins; "
            "random weights are near-ties, so their ~0 agreement is a "
            "property of margin-free logits, not of int4 — the bench's "
            "mixed-int4 row stays gated on the pessimistic random-weight "
            "bound and cites this artifact for the structured-weight bound."
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
