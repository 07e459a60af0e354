"""In-environment training of tiny Qwen-architecture LMs for the cascade.

Why this exists: the environment has no real model weights or network
(PARITY.md), so measured ANSWER quality from an actual model — the
reference's headline axis (">95% quality on MMLU/HumanEval/SimpleQA",
``/root/reference/src/evaluation/quality_metrics.py:36-240``,
``experiments/evaluate_pipeline.py:190-266``) — has to come from models
trained here. This module trains tiny Qwen2-architecture LMs (the exact
param layout ``models/qwen.init_params`` emits) on a char-level QA corpus
built from the frozen ``data/`` suites; capability TIERS come from capacity
and training compute (a small tier memorizes fewer answers — the same
capacity-vs-coverage gradient that separates 7B from 72B on factual
recall). The trained float weights then flow through the PRODUCTION
checkpoint path (models/loader.save_checkpoint -> load_params -> quantize
-> TierEngine), so everything downstream is the real serving system.

Consumers: scripts/trained_cascade_eval.py (the TRAINED_CASCADE.json bench
artifact) and scripts/real_smoke.py --rehearse (VERDICT r4 next #2/#3).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .config import ModelSpec
from .qwen import Params, apply_rope, init_params, rms_norm, rope_tables

__all__ = [
    "CharTokenizer",
    "TierRecipe",
    "answer_text",
    "encode_qa",
    "lm_forward",
    "train_lm",
    "qa_corpus",
]


# ---------------------------------------------------------------------------
# char-level tokenizer (deterministic, vocab-bounded, reversible)


class CharTokenizer:
    """Reversible char-level tokenizer over printable ASCII.

    ids: 0 = pad, 1 = BOS, 2 = EOS, 3 = unknown, 4.. = charset. Fits any
    ModelSpec with vocab_size >= 4 + len(charset) (default charset is 96
    printable chars -> vocab 100).
    """

    PAD, BOS, EOS, UNK = 0, 1, 2, 3

    def __init__(self) -> None:
        charset = [chr(c) for c in range(32, 127)] + ["\n"]
        self._c2i = {c: i + 4 for i, c in enumerate(charset)}
        self._i2c = {i + 4: c for i, c in enumerate(charset)}
        self.vocab_size = 4 + len(charset)

    def encode(self, text: str) -> list[int]:
        return [self._c2i.get(c, self.UNK) for c in text]

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i in (self.PAD, self.BOS, self.UNK):
                continue
            out.append(self._i2c.get(i, ""))
        return "".join(out)


# ---------------------------------------------------------------------------
# QA corpus from the frozen suites


def answer_text(item: dict) -> str:
    """Canonical answer declaration the objective scorers accept
    (evalx/datasets.py: declared answers beat incidental tokens)."""
    task = item["task"]
    if task == "factual":
        return f"The answer is {item['answer'].strip().upper()}."
    if task == "math":
        return f"The answer is {item['answer']}."
    if task == "code":
        return f"```python\n{item['answer']}\n```"
    raise ValueError(f"no canonical answer for task {task!r}")


ANSWER_CUE = "\nAnswer: "


def qa_corpus(items: Sequence[dict]) -> list[tuple[str, str]]:
    """(context, target) pairs: context = prompt + answer cue, target = the
    canonical answer declaration."""
    return [(it["prompt"] + ANSWER_CUE, answer_text(it)) for it in items]


def encode_qa(
    tokenizer: CharTokenizer,
    pairs: Sequence[tuple[str, str]],
    seq_len: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack pairs into fixed [N, seq_len] rows with an answer-region loss
    mask. Row = BOS + context + target + EOS (left-truncating the CONTEXT
    when too long — the answer is never cut). Loss covers target + EOS only:
    capacity goes to answering, not to memorizing prompt text."""
    toks = np.zeros((len(pairs), seq_len), np.int32)
    mask = np.zeros((len(pairs), seq_len), np.float32)
    for r, (ctx, tgt) in enumerate(pairs):
        c = tokenizer.encode(ctx)
        t = tokenizer.encode(tgt) + [tokenizer.EOS]
        room = seq_len - 1 - len(t)
        if room < 0:
            t = t[: seq_len - 1]
            room = 0
        c = c[-room:] if room else []
        row = [tokenizer.BOS] + c + t
        toks[r, : len(row)] = row
        mask[r, 1 + len(c) : len(row)] = 1.0
    return toks, mask


# ---------------------------------------------------------------------------
# training forward (same param layout the production engine consumes)


def lm_forward(params: Params, spec: ModelSpec, tokens: jax.Array) -> jax.Array:
    """[B, S] -> logits [B, S, V]. Differentiable training twin of the
    engine's prefill (models/qwen.prefill): the trained weights then flow
    through fuse+quantize+TierEngine — this forward exists only to produce
    gradients."""
    B, S = tokens.shape
    sm_scale = 1.0 / math.sqrt(spec.head_dim)
    h = params["embed"][tokens]
    pos = jnp.arange(S)[None, :].repeat(B, axis=0)
    cos, sin = rope_tables(pos, spec.head_dim, spec.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    causal = jnp.tril(jnp.ones((S, S), bool))
    # padding columns must not receive attention
    pad_ok = tokens != CharTokenizer.PAD
    mask = causal[None] & pad_ok[:, None, :]
    for layer in params["layers"]:
        x = rms_norm(h, layer["input_norm"], spec.rms_eps)
        q = (x @ layer["q_proj"] + layer.get("q_bias", 0.0)).reshape(
            B, S, spec.n_heads, spec.head_dim)
        k = (x @ layer["k_proj"] + layer.get("k_bias", 0.0)).reshape(
            B, S, spec.n_kv_heads, spec.head_dim)
        v = (x @ layer["v_proj"] + layer.get("v_bias", 0.0)).reshape(
            B, S, spec.n_kv_heads, spec.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        rep = spec.n_heads // spec.n_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm_scale
        att = jnp.where(mask[:, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, S, -1)
        h = h + o @ layer["o_proj"]
        x = rms_norm(h, layer["post_norm"], spec.rms_eps)
        g = jax.nn.silu(x @ layer["gate_proj"]) * (x @ layer["up_proj"])
        h = h + g @ layer["down_proj"]
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    head = params["embed"].T if spec.tie_embeddings else params["lm_head"]
    return h @ head


def train_lm(
    spec: ModelSpec,
    tokens: np.ndarray,
    loss_mask: np.ndarray,
    *,
    steps: int = 1000,
    batch: int = 32,
    lr: float = 3e-3,
    weight_decay: float = 1e-4,
    seed: int = 0,
    warmup_frac: float = 0.05,
    progress: Optional[Callable[[str], None]] = None,
) -> tuple[Params, dict]:
    """AdamW + cosine training of the masked next-token loss; returns
    (float32 params, report). Rows are sampled with replacement each step —
    the corpus is small and memorization IS the capability being trained."""
    import optax

    params = init_params(spec, jax.random.key(seed), dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, max(int(steps * warmup_frac), 1), steps, lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=weight_decay))
    opt_state = tx.init(params)

    def loss_fn(p, toks, msk):
        logits = lm_forward(p, spec, toks[:, :-1])
        tgt = toks[:, 1:]
        m = msk[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def step_fn(p, s, toks, msk):
        l, g = jax.value_and_grad(loss_fn)(p, toks, msk)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rng = np.random.default_rng(seed)
    t0 = time.time()
    losses = []
    toks_d = jnp.asarray(tokens)
    mask_d = jnp.asarray(loss_mask)
    n = len(tokens)
    for i in range(steps):
        sl = jnp.asarray(rng.integers(0, n, size=batch))
        params, opt_state, l = step_fn(params, opt_state, toks_d[sl], mask_d[sl])
        if i % 50 == 0 or i == steps - 1:
            lf = float(l)
            losses.append(lf)
            if progress:
                progress(f"step {i}/{steps} loss {lf:.3f} "
                         f"({time.time() - t0:.0f}s)")
    report = {
        "steps": steps,
        "batch": batch,
        "final_loss_nats": float(losses[-1]),
        "loss_curve": [round(x, 4) for x in losses],
        "params": int(spec.approx_params),
        "train_wall_s": round(time.time() - t0, 1),
    }
    return params, report


@dataclass(frozen=True)
class TierRecipe:
    """Capacity/compute recipe for one cascade tier's tiny LM."""

    name: str
    hidden: int
    n_layers: int
    n_heads: int
    ffn: int
    steps: int
    head_dim: int = 64
    # per-recipe LR: the wider/deeper tier destabilises at the small tiers'
    # 3e-3 (measured: 448x6 ended at loss 0.271 vs 256x4's 0.018 — the
    # CAPABILITY gradient inverted); width-scaled LR restores monotone
    # convergence
    lr: float = 3e-3

    def spec(self, vocab_size: int, max_seq_len: int = 512) -> ModelSpec:
        return ModelSpec(
            name=self.name, vocab_size=vocab_size, hidden=self.hidden,
            n_layers=self.n_layers, n_heads=self.n_heads,
            n_kv_heads=max(self.n_heads // 2, 1), head_dim=self.head_dim,
            ffn=self.ffn, max_seq_len=max_seq_len, rope_theta=10_000.0,
        )


# Default 3-tier ladder: capacity AND compute scale together, the way the
# real 7B->32B->72B ladder does. head_dim 64 keeps Q/K/V shapes modest;
# hidden = n_heads * head_dim so o_proj stays square.
DEFAULT_RECIPES = (
    TierRecipe("trained-t0", hidden=128, n_layers=2, n_heads=2, ffn=384,
               steps=700),
    TierRecipe("trained-t1", hidden=256, n_layers=4, n_heads=4, ffn=768,
               steps=1400, lr=2e-3),
    TierRecipe("trained-t2", hidden=448, n_layers=6, n_heads=8, ffn=1344,
               steps=3600, lr=1e-3),
)
