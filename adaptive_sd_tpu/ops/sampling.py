"""On-device token sampling: greedy / temperature / top-p, plus logprob
extraction for the quality predictor's features.

Role parity: vLLM's sampler (outsourced by the reference). Kept as plain jnp —
sampling is O(vocab) elementwise + one reduce, which XLA fuses into the final
logits matmul; a hand-written kernel would buy nothing (HBM-bound on the
logits read either way).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    token: jax.Array     # [B] int32
    logprob: jax.Array   # [B] f32 logprob of the sampled token


def greedy_sample(logits: jax.Array) -> SampleResult:
    """logits: [B, V] -> argmax token + its logprob."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return SampleResult(token, jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0])


def sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 0.0,
    top_p: float = 1.0,
) -> SampleResult:
    """Temperature + nucleus sampling; temperature 0 reduces to greedy.

    Static-shape implementation of top-p: sort once, mask the tail whose
    cumulative probability exceeds top_p (always keeping the top token),
    sample from the renormalised head. No data-dependent shapes, so it jits
    into the decode step.
    """
    if temperature <= 0.0:
        return greedy_sample(logits)
    scaled = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the cumulative prob *before* them is < top_p.
        keep = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    token = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    return SampleResult(token, jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0])


def logprob_stats(logprobs: jax.Array, length: jax.Array) -> dict[str, jax.Array]:
    """Summary statistics over per-token logprobs with padding masked by
    ``length`` — feature inputs for the quality predictor (the reference's
    64-dim scheme uses mean/std/min/quantiles of draft logprobs,
    src/training/generate_training_data.py:148-205)."""
    n = logprobs.shape[-1]
    pos = jnp.arange(n)
    mask = pos < length
    cnt = jnp.maximum(jnp.sum(mask), 1)
    masked = jnp.where(mask, logprobs, 0.0)
    mean = jnp.sum(masked) / cnt
    var = jnp.sum(jnp.where(mask, (logprobs - mean) ** 2, 0.0)) / cnt
    mn = jnp.min(jnp.where(mask, logprobs, jnp.inf))
    return {
        "mean": mean,
        "std": jnp.sqrt(var),
        "min": mn,
        "frac_low_conf": jnp.sum(jnp.where(mask, logprobs < -2.3, False)) / cnt,  # p < 0.1
    }
