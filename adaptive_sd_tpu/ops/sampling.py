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


def adjusted_logits(
    logits: jax.Array, temperature: float, top_p: float
) -> jax.Array:
    """The temperature/top-p–adjusted logits that define the sampling
    distribution (softmax of the result). Shared by the sampler and by the
    speculative verifier, which must score draft tokens under the SAME
    adjusted target distribution for the acceptance rule to be exact.

    Static-shape top-p: sort once along the last axis, mask the tail whose
    cumulative probability exceeds top_p (always keeping the top token).
    Works for any leading batch dims.
    """
    scaled = logits.astype(jnp.float32) / max(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.flip(jnp.sort(scaled, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the cumulative prob *before* them is < top_p.
        keep = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    return scaled


def sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 0.0,
    top_p: float = 1.0,
) -> SampleResult:
    """Temperature + nucleus sampling; temperature 0 reduces to greedy.
    No data-dependent shapes, so it jits into the decode step."""
    if temperature <= 0.0:
        return greedy_sample(logits)
    scaled = adjusted_logits(logits, temperature, top_p)
    token = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    return SampleResult(token, jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0])


def sample_with_topk(
    logits: jax.Array,
    key: jax.Array,
    k: int,
    temperature: float,
    top_p: float = 1.0,
) -> tuple[SampleResult, jax.Array, jax.Array]:
    """Sample AND return the top-k of the adjusted distribution:
    (result, topk_ids [B, k] int32, topk_probs [B, k] f32).

    The top-k rows are the draft-side support handed to the speculative
    verifier so it can form the exact residual distribution max(p - q, 0)
    (Leviathan et al. 2023 rejection rule) without shipping the full vocab
    row. With nucleus sampling the support is exactly the nucleus, so the
    rule is EXACT whenever the nucleus fits in k; otherwise the tail mass
    outside the top-k is treated as unavailable to the residual (a
    conservative approximation)."""
    scaled = adjusted_logits(logits, temperature, top_p)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    token = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    lp_tok = jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0]
    top_lp, top_ids = jax.lax.top_k(logp, k)
    return SampleResult(token, lp_tok), top_ids.astype(jnp.int32), jnp.exp(top_lp)


def speculative_accept(
    key: jax.Array,
    draft_tokens: jax.Array,   # [B, D] int32 draft proposals
    draft_lp: jax.Array,       # [B, D] f32 log q_i(draft token i) (draft model)
    q_ids: jax.Array,          # [B, D, K] int32 draft top-K support ids
    q_probs: jax.Array,        # [B, D, K] f32 draft top-K probabilities
    target_logp: jax.Array,    # [B, D+1, V] f32 ADJUSTED target log-probs;
                               #   row i scores draft token i, row D is the
                               #   bonus position after full acceptance
    draft_len: jax.Array,      # [B] int32 valid draft lengths
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Stochastic speculative acceptance (the Leviathan/Chen rejection rule),
    vectorised over the batch and draft window with no host round-trip:

      accept token i  iff  u_i < min(1, p_i / q_i)
      at the first rejection, emit a sample from norm(max(p - q, 0))
      on full acceptance, emit a sample from p at the bonus position

    which makes the emitted sequence an EXACT sample from the target
    distribution (given q's support ⊆ the provided top-K rows — true for
    nucleus sampling with nucleus ≤ K). Returns (n_acc [B], next_token [B],
    next_logp [B] = target logprob of the emitted token).

    Role parity: the reference has no stochastic verify (its cascade is
    greedy re-generation); this is the vLLM rejection-sampler capability the
    TPU build owns natively (SURVEY.md §2.8).
    """
    B, D = draft_tokens.shape
    V = target_logp.shape[-1]
    k_u, k_r = jax.random.split(key)

    # per-position acceptance test in log space
    p_tok = jnp.take_along_axis(
        target_logp[:, :D], draft_tokens[..., None], axis=-1
    )[..., 0]                                              # [B, D] log p_i
    log_u = jnp.log(jax.random.uniform(k_u, (B, D), minval=1e-12))
    accept = log_u < jnp.minimum(p_tok - draft_lp, 0.0)
    valid = jnp.arange(D)[None, :] < draft_len[:, None]
    ok = jnp.logical_and(accept, valid)
    n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)  # [B]

    # distribution at the emission position: residual on rejection, target on
    # full acceptance (bonus token)
    pos = jnp.minimum(n_acc, D)                            # rejection/bonus row
    logp_here = jnp.take_along_axis(
        target_logp, pos[:, None, None], axis=1
    )[:, 0]                                                # [B, V]
    p_here = jnp.exp(logp_here)
    q_pos = jnp.minimum(n_acc, D - 1)
    ids_here = jnp.take_along_axis(q_ids, q_pos[:, None, None], axis=1)[:, 0]    # [B, K]
    qp_here = jnp.take_along_axis(q_probs, q_pos[:, None, None], axis=1)[:, 0]   # [B, K]
    q_here = jnp.zeros((B, V), jnp.float32).at[
        jnp.arange(B)[:, None], ids_here
    ].add(qp_here)
    full = n_acc >= draft_len
    resid = jnp.maximum(p_here - q_here, 0.0)
    mass = jnp.sum(resid, axis=-1, keepdims=True)
    # degenerate residual (q covers p, numerically) -> fall back to target
    use_target = jnp.logical_or(full[:, None], mass < 1e-9)
    dist = jnp.where(use_target, p_here, resid)
    next_tok = jax.random.categorical(
        k_r, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1
    ).astype(jnp.int32)
    next_lp = jnp.take_along_axis(logp_here, next_tok[:, None], axis=-1)[:, 0]
    return n_acc, next_tok, next_lp


def row_adjusted_logits(
    logits: jax.Array, temperatures: jax.Array, top_ps=None
) -> jax.Array:
    """Per-ROW temperature + nucleus adjustment (vectorised analog of
    :func:`adjusted_logits` for the continuous-batching lanes, whose
    requests carry individual temperature/top_p). ``logits`` may be [B, V]
    or [B, S, V]; ``temperatures``/``top_ps`` are [B]. Greedy rows
    (temperature <= 0) pass through at T=1 unfiltered — their argmax is
    taken separately and the adjustment is unused downstream."""
    logits = logits.astype(jnp.float32)
    greedy = temperatures <= 0.0
    safe_t = jnp.where(greedy, 1.0, temperatures)
    t_shape = (-1,) + (1,) * (logits.ndim - 1)
    scaled = logits / safe_t.reshape(t_shape)
    if top_ps is None:
        return scaled
    sorted_logits = jnp.flip(jnp.sort(scaled, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    p_row = top_ps.reshape(t_shape)
    keep = cum - probs < p_row  # always keeps each row's top token
    cutoff = jnp.min(
        jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    apply = jnp.logical_and(p_row < 1.0, ~greedy.reshape(t_shape))
    return jnp.where(
        jnp.logical_and(apply, scaled < cutoff), -jnp.inf, scaled
    )


def sample_rows(
    logits: jax.Array, key: jax.Array, temperatures: jax.Array, top_ps=None
) -> SampleResult:
    """Per-row temperature (+ nucleus) sampling in one fused op: rows with
    temperature <= 0 take the argmax (greedy). Built for the continuous-
    batching scheduler, whose lanes carry per-request temperatures/top_p —
    one device dispatch samples every lane (vs. one dispatch per lane),
    which matters through the ~0.7 ms TPU tunnel. Greedy rows report
    log-softmax of the raw logits (same convention as greedy_sample)."""
    greedy = temperatures <= 0.0
    scaled = row_adjusted_logits(logits, temperatures, top_ps)
    cat = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    token = jnp.where(greedy, arg, cat)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    return SampleResult(
        token, jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0]
    )


def sample_rows_with_topk(
    logits: jax.Array, key: jax.Array, temperatures: jax.Array, k: int,
    top_ps=None,
) -> tuple[SampleResult, jax.Array, jax.Array]:
    """``sample_rows`` that also returns the top-k of each row's adjusted
    distribution: (result, topk_ids [B, k] int32, topk_probs [B, k] f32) —
    the per-lane draft support the continuous-batching scheduler carries so
    a later tier can run the exact stochastic verify on lane-decoded drafts.
    With nucleus sampling the adjusted distribution's support IS the
    nucleus, so the carried rows are exact whenever the nucleus fits in k.
    Greedy rows (temperature <= 0) take the argmax; their support rows are
    of the unscaled softmax and are unused downstream (greedy chains verify
    by argmax match, no support needed)."""
    greedy = temperatures <= 0.0
    scaled = row_adjusted_logits(logits, temperatures, top_ps)
    cat = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    token = jnp.where(greedy, arg, cat)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    top_lp, top_ids = jax.lax.top_k(logp, k)
    return (
        SampleResult(token, jnp.take_along_axis(logp, token[:, None], axis=-1)[:, 0]),
        top_ids.astype(jnp.int32),
        jnp.exp(top_lp),
    )


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
