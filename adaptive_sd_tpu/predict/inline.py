"""On-device (inline) quality prediction: device-computable features + MLP.

The host predictor (predict/mlp.py) sees 64 features including text
statistics; the *inline* predictor uses exactly the 16 logprob-derived
features (the draft model's own confidence — the strongest signal), which are
computable inside the decode graph from the generation buffers. Its feature
vector equals columns [16:32] of the host vector, so one synthetic/real
dataset trains both.

This is the piece that makes stopping decisions *on device*: the fused draft
graph ends with ``inline_features_jnp -> mlp_forward -> optimal_stopping_rule
_jnp`` and the escalation flag is fetched together with the tokens — no host
round-trip in the decision path (SURVEY.md §7 "on-device stopping").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..policy.dp import optimal_stopping_rule_jnp
from .mlp import MLPQualityPredictor, mlp_forward

INLINE_SLICE = slice(16, 32)
INLINE_DIM = 16


def inline_features_jnp(logprobs: jax.Array, lengths: jax.Array) -> jax.Array:
    """[B, T] per-token logprobs (zero-padded) + [B] lengths -> [B, 16].

    Replicates predict.features._logprob_block semantics exactly (masking via
    lengths; quantiles over the valid prefix).
    """
    B, T = logprobs.shape
    pos = jnp.arange(T)[None, :]
    mask = pos < lengths[:, None]
    cnt = jnp.maximum(lengths, 1).astype(jnp.float32)

    lp = jnp.where(mask, logprobs, 0.0)
    mean = jnp.sum(lp, axis=1) / cnt
    var = jnp.sum(jnp.where(mask, (logprobs - mean[:, None]) ** 2, 0.0), axis=1) / cnt
    std = jnp.sqrt(var)
    big = jnp.where(mask, logprobs, jnp.inf)
    small = jnp.where(mask, logprobs, -jnp.inf)
    mn = jnp.min(big, axis=1)
    mx = jnp.max(small, axis=1)

    # Quantiles over the valid prefix: sort padded-with-inf so valid entries
    # lead; linear interpolation matches numpy.percentile.
    s = jnp.sort(big, axis=1)

    def q_at(q):
        pos_f = q * (lengths - 1).astype(jnp.float32)
        lo = jnp.clip(jnp.floor(pos_f).astype(jnp.int32), 0, T - 1)
        hi = jnp.clip(lo + 1, 0, T - 1)
        frac = pos_f - lo.astype(jnp.float32)
        v_lo = jnp.take_along_axis(s, lo[:, None], axis=1)[:, 0]
        v_hi = jnp.take_along_axis(s, hi[:, None], axis=1)[:, 0]
        v_hi = jnp.where(hi < lengths, v_hi, v_lo)  # clamp at prefix end
        return v_lo + frac * (v_hi - v_lo)

    q25, q50, q75 = q_at(0.25), q_at(0.50), q_at(0.75)

    frac_low = jnp.sum(jnp.where(mask, logprobs < -2.3, False), axis=1) / cnt
    frac_half = jnp.sum(jnp.where(mask, logprobs < -0.69, False), axis=1) / cnt
    first = logprobs[:, 0]
    last_idx = jnp.clip(lengths - 1, 0, T - 1)
    last = jnp.take_along_axis(logprobs, last_idx[:, None], axis=1)[:, 0]
    half_len = jnp.maximum(lengths // 2, 1)
    first_half = jnp.where(pos < half_len[:, None], logprobs, 0.0)
    second_half = jnp.where(
        jnp.logical_and(pos >= half_len[:, None], mask), logprobs, 0.0
    )
    mean_first = jnp.sum(first_half, axis=1) / half_len.astype(jnp.float32)
    n_second = jnp.maximum(lengths - half_len, 1).astype(jnp.float32)
    mean_second = jnp.sum(second_half, axis=1) / n_second
    trend = jnp.where(lengths >= 2, mean_second - mean_first, 0.0)
    perplexity = jnp.exp(-mean)
    probs = jnp.where(mask, jnp.exp(jnp.clip(logprobs, -20, 0)), 0.0)
    probs_mean = jnp.sum(probs, axis=1) / cnt
    probs_min = jnp.min(jnp.where(mask, jnp.exp(jnp.clip(logprobs, -20, 0)), jnp.inf), axis=1)
    log_n = jnp.log1p(lengths.astype(jnp.float32))

    feats = jnp.stack(
        [mean, std, mn, mx, q25, q50, q75, frac_low, frac_half, first, last,
         trend, perplexity, probs_mean, probs_min, log_n],
        axis=1,
    )
    return jnp.nan_to_num(feats, nan=0.0, posinf=1e4, neginf=-1e4)


class InlinePolicyParams(NamedTuple):
    """Everything the fused graph needs for the on-device decision."""

    mlp: dict           # MLP weights (predict.mlp layout)
    mean: jax.Array     # [16] feature standardisation
    std: jax.Array      # [16]
    costs: jax.Array    # [n_stages] cumulative, normalised
    priors: jax.Array   # [n_stages] acceptance priors for unvisited stages
    lam: jax.Array      # scalar


def inline_decision(
    policy: InlinePolicyParams,
    logprobs: jax.Array,   # [B, T]
    lengths: jax.Array,    # [B]
    stage_index: int,
) -> tuple[jax.Array, jax.Array]:
    """On-device stopping decision. Returns (escalate [B] bool, p_hat [B])."""
    feats = inline_features_jnp(logprobs, lengths)
    x = jnp.clip((feats - policy.mean) / policy.std, -10.0, 10.0)
    p_hat = mlp_forward(policy.mlp, x)  # [B]
    n = policy.priors.shape[0]
    idx = jnp.arange(n)
    def decide_one(p_one):
        p_vec = jnp.where(idx == stage_index, p_one, policy.priors)
        p_vec = jnp.where(idx < stage_index, 0.0, p_vec)  # visited+rejected
        k = optimal_stopping_rule_jnp(p_vec, policy.costs, policy.lam)
        return k > stage_index
    escalate = jax.vmap(decide_one)(p_hat)
    return escalate, p_hat


def train_inline_predictor(
    X64: np.ndarray, y: np.ndarray, **fit_kwargs
) -> MLPQualityPredictor:
    """Train the inline head on the 16 device-computable columns of the
    full 64-dim training matrix (one dataset serves both predictors)."""
    # embed_dim=0: the on-device graph has no text to hash — dense-only head
    m = MLPQualityPredictor(feature_dim=INLINE_DIM, hidden=(64, 32), embed_dim=0)
    m.fit(np.asarray(X64)[:, INLINE_SLICE], y, **fit_kwargs)
    return m


def policy_from_predictor(
    predictor: MLPQualityPredictor,
    costs,
    priors,
    lam: float,
) -> InlinePolicyParams:
    if predictor.feature_dim != INLINE_DIM:
        raise ValueError(f"inline predictor must have {INLINE_DIM} features")
    if getattr(predictor, "embed_dim", 0):
        raise ValueError("inline predictor must be dense-only (embed_dim=0)")
    costs = jnp.asarray(costs, jnp.float32)
    return InlinePolicyParams(
        mlp=predictor.params,
        mean=jnp.asarray(predictor.mean),
        std=jnp.asarray(predictor.std),
        costs=costs / costs[-1],
        priors=jnp.asarray(priors, jnp.float32),
        lam=jnp.float32(lam),
    )
