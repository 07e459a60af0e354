"""Synthetic-but-principled benchmark workload for the headline bench.

The round-1 bench calibrated its difficulty model to reproduce the
reference's published λ=1.0 stage distribution (capacities [0.72, 0.86,
0.98], slope 16 — VERDICT round-1 "What's weak" #1: circular). This module
replaces it with a workload built from neutral primitives so that the stage
distribution and quality preservation the bench reports are OUTPUTS of the
system under test (trained predictor → DP policy), with no constant
traceable to the target distribution:

* Items span ``N_LEVELS`` complexity levels; difficulty d = (level + U)/N,
  uniform on [0, 1) marginally. The level manifests in OBSERVABLE prompt
  text (length, reasoning/math vocabulary, clause density), so a
  feature-based predictor genuinely learns the mapping — and its
  train→eval generalization error is real, not injected Gaussian noise.
* Tier capability: P(tier k solves item) = sigmoid((cap_k − d) / s). The
  cap_k come from the theory layer's per-stage quality bounds
  (policy/theory.py TheoreticalParameters.quality_bounds — the problem's
  config surface, reference src/theory/optimal_stopping.py:38-43): by
  sigmoid symmetry over the uniform difficulty marginal, tier k's expected
  solve rate over the whole workload ≈ cap_k, which is exactly what a
  "quality bound" asserts. Dispersion ``s`` is a free workload parameter
  (how cleanly tasks separate into solvable/unsolvable per tier).
* Quality labels remain model-generated (the environment has no real model
  weights or datasets — PARITY.md); benches must report
  ``quality_model: "synthetic-workload"`` so the number is never mistaken
  for a measured-model result.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import numpy as np

N_LEVELS = 5

# Word pools per complexity level. Level-correlated vocabulary overlaps the
# predictor's task-indicator lexicon (predict/features.py) the way real task
# mixes do: factual lookups are easy, rigorous derivations are hard.
_TOPICS = [
    "the capital of France", "the boiling point of water", "photosynthesis",
    "binary search", "a haiku about rain", "the French Revolution",
    "gradient descent", "the Riemann hypothesis", "TCP congestion control",
    "protein folding", "the halting problem", "market equilibria",
]
_LEVEL_STEMS = [
    ["What is {t}?", "Define {t}.", "Name {t}.", "When was {t} discovered?"],
    ["Summarize {t} in two sentences.", "List three facts about {t}.",
     "Translate the phrase '{t}' into simple terms."],
    ["Explain how {t} works, step by step.", "Write a short function about {t}.",
     "Compare {t} with its closest alternative."],
    ["Analyze the tradeoffs of {t} and argue for one design.",
     "Solve this multi-step problem involving {t} and show your reasoning.",
     "Derive the update equation connected to {t} and verify each step."],
    ["Rigorously prove the optimality condition underlying {t}, analyze the "
     "regret bound, and evaluate whether the sample complexity is tight.",
     "Construct a counterexample for the naive approach to {t}, then prove "
     "the corrected theorem and compute the asymptotic constants."],
]
_FILLER = [
    "Consider all relevant assumptions.", "Keep the answer concise.",
    "Use precise terminology.", "Cite the key equation where needed.",
    "State intermediate results explicitly.", "Avoid hand-waving.",
]


@dataclass(frozen=True)
class WorkloadItem:
    prompt: str
    difficulty: float   # in [0, 1)
    level: int          # 0..N_LEVELS-1


# The REAL models' published MMLU accuracies (Qwen2.5 Technical Report,
# arXiv:2412.15115, base-model evaluation table; matching the model cards):
# 7B 74.2, 14B 79.7, 32B 83.3, 72B 86.1. This is the measured capability
# structure the reference's >95%-quality claim rests on — 32B alone already
# preserves 83.3/86.1 = 96.7% of always-72B on MMLU, which is exactly why an
# adaptive cascade rarely needs the top tier. (Independent of the
# reference's published STAGE DISTRIBUTION — these are the upstream models'
# own benchmark scores.)
_MEASURED_CAPS = [0.742, 0.797, 0.833, 0.861]  # 7B, 14B, 32B, 72B


def tier_capabilities(n_tiers: int, source: str = "measured") -> np.ndarray:
    """Per-tier solve rates.

    ``source="measured"`` (default): the published MMLU accuracies of the
    actual Qwen2.5 hierarchy (see _MEASURED_CAPS) — the capability-gap
    structure real cascades face.
    ``source="theory"``: the theory layer's nominal quality bounds
    (policy/theory.py TheoreticalParameters.quality_bounds, the reference's
    config surface src/theory/optimal_stopping.py:38-43) — steeper gaps,
    kept for sensitivity analysis.

    A 3-tier 7B→32B→72B cascade keeps the smallest tier's entry plus the
    largest ``n_tiers - 1`` entries (drops the 14B row).
    """
    if source == "measured":
        bounds = list(_MEASURED_CAPS)
    elif source == "theory":
        from ..policy.theory import TheoreticalParameters

        bounds = list(TheoreticalParameters().quality_bounds)
    else:
        raise ValueError(f"unknown capability source {source!r}")
    if n_tiers >= len(bounds):
        return np.asarray(bounds[:n_tiers], np.float64)
    return np.asarray([bounds[0]] + bounds[-(n_tiers - 1):], np.float64)


def make_workload(n: int, seed: int = 0) -> list[WorkloadItem]:
    """``n`` items, levels uniform, difficulty = (level + U)/N_LEVELS."""
    rng = np.random.default_rng(seed)
    items: list[WorkloadItem] = []
    for i in range(n):
        level = int(rng.integers(N_LEVELS))
        d = (level + float(rng.random())) / N_LEVELS
        stem = _LEVEL_STEMS[level][int(rng.integers(len(_LEVEL_STEMS[level])))]
        topic = _TOPICS[int(rng.integers(len(_TOPICS)))]
        prompt = stem.format(t=topic)
        # harder prompts are longer and denser (observable difficulty signal)
        for _ in range(level + int(rng.integers(0, 2))):
            prompt += " " + _FILLER[int(rng.integers(len(_FILLER)))]
        items.append(WorkloadItem(prompt=prompt, difficulty=d, level=level))
    return items


def solve_prob(cap: float, difficulty: float, dispersion: float = 0.15) -> float:
    """P(a tier with capability ``cap`` solves an item of ``difficulty``)."""
    return 1.0 / (1.0 + math.exp(-(cap - difficulty) / dispersion))


def solve_prob_matrix(
    items: Sequence[WorkloadItem], caps: np.ndarray, dispersion: float = 0.15
) -> np.ndarray:
    """[n_items, n_tiers] ground-truth solve probabilities."""
    d = np.asarray([it.difficulty for it in items])[:, None]
    return 1.0 / (1.0 + np.exp(-(caps[None, :] - d) / dispersion))


def realize_goodness(
    items: Sequence[WorkloadItem],
    caps: np.ndarray,
    *,
    dispersion: float = 0.15,
    seed: int = 0,
) -> np.ndarray:
    """[n_items, n_tiers] bool — one Bernoulli realization of which tiers'
    answers are good for each item (the world the bench scores against)."""
    rng = np.random.default_rng(seed)
    p = solve_prob_matrix(items, caps, dispersion)
    return rng.random(p.shape) < p


# Observation-noise calibration for the draft confidence channel: a pure-
# observation detector's AUC against realized goodness is 1 - flip_prob;
# flip_prob = 0.15 pins it to 0.85 — the reference's PUBLISHED predictor
# discrimination on real drafts (shallow-MLP AUC 0.85,
# /root/reference/docs/papers/FINAL_PAPER.md:232-237; BASELINE.md "Predictor
# accuracy"). The rig therefore grants the predictor exactly as much
# draft-observability as the reference measured on real model outputs — no
# more, no less.
CONFIDENCE_FLIP_PROB = 0.15


def confidence_logprob_shift(
    goodness: np.ndarray,
    *,
    flip_prob: float = CONFIDENCE_FLIP_PROB,
    scale: float = 2.0,
    seed: int = 0,
) -> np.ndarray:
    """Per-(item, tier) additive logprob shift carrying a NOISY observation
    of realized answer goodness — the confidence signal real drafts carry.

    Why this exists: a real cascade's quality predictor scores the (prompt,
    draft) pair, and most of its discrimination comes from the draft itself
    — token-level confidence correlates with answer quality (the reference
    trains exactly this: draft-logprob statistics are its strongest features,
    src/training/generate_training_data.py:148-205, and its real-data
    predictor reaches AUC 0.85 on them). A random-weight bench engine's
    draft carries NO such signal: its logprobs are independent of the
    workload's realized goodness, which structurally denies the system the
    information every real cascade predictor uses and makes the realized-
    goodness oracle look further away than it is (VERDICT r3 "decompose the
    oracle gap"). This channel restores the draft's observability at the
    reference's measured level: each (item, tier) observation is the
    realized goodness bit flipped with ``flip_prob`` (AUC of the bit alone =
    1 - flip_prob), emitted as a +-``scale`` shift of the draft's mean
    logprob — the feature the predictor's logprob block actually reads.
    The predictor must still LEARN the mapping (and its reliability) from
    training drafts; nothing reveals eval realizations directly.
    """
    g = np.asarray(goodness, bool)
    rng = np.random.default_rng(seed)
    obs = np.where(rng.random(g.shape) < flip_prob, ~g, g)
    return scale * (2.0 * obs.astype(np.float64) - 1.0)
