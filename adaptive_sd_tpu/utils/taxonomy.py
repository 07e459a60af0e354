"""Task taxonomy: prompt classification into domain / complexity / cognitive
load, with per-tier model recommendations.

Role parity: reference ``src/utils/task_taxonomy.py`` (AdvancedTaskClassifier:
regex vocabularies over 6 domains x 5 complexity levels x 6 cognitive loads,
TaskCharacteristics output, model recommendation, demo). The classifier feeds
the predictor's task-indicator features and the serving layer's
quality-critical routing.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from ..core.types import CognitiveLoad, TaskCharacteristics, TaskComplexity, TaskDomain

_DOMAIN_PATTERNS: dict[TaskDomain, list[re.Pattern]] = {
    TaskDomain.CODE: [
        re.compile(r"\b(code|function|class|bug|debug|implement|algorithm|python|java|sql)\b", re.I),
        re.compile(r"```|def |import |return |print\("),
    ],
    TaskDomain.MATH: [
        re.compile(r"\b(solve|calculate|equation|integral|derivative|theorem|proof|probability)\b", re.I),
        re.compile(r"\d+\s*[-+*/^=]\s*\d+"),
    ],
    TaskDomain.REASONING: [
        re.compile(r"\b(why|explain|analyze|compare|evaluate|argue|justify|infer|deduce)\b", re.I),
        re.compile(r"\bstep[- ]by[- ]step\b", re.I),
    ],
    TaskDomain.CREATIVE: [
        re.compile(r"\b(story|poem|write|imagine|fiction|song|creative|character|plot)\b", re.I),
    ],
    TaskDomain.FACTUAL: [
        re.compile(r"\b(who|what|when|where|capital|president|year|date|population|define)\b", re.I),
    ],
}

_COMPLEXITY_HARD = re.compile(
    r"\b(prove|optimal|formally|rigorous|multi[- ]step|constraint|tradeoff|distributed|concurrent)\b",
    re.I,
)
_COMPLEXITY_EASY = re.compile(
    r"\b(simple|briefly|one word|yes or no|list|name)\b", re.I
)

_LOAD_PATTERNS: dict[CognitiveLoad, re.Pattern] = {
    CognitiveLoad.RECALL: re.compile(r"\b(what is|who is|when did|name|define|list)\b", re.I),
    CognitiveLoad.COMPREHENSION: re.compile(r"\b(summarize|describe|explain|paraphrase)\b", re.I),
    CognitiveLoad.APPLICATION: re.compile(r"\b(use|apply|implement|solve|compute|calculate)\b", re.I),
    CognitiveLoad.ANALYSIS: re.compile(r"\b(analyze|compare|contrast|break down|why)\b", re.I),
    CognitiveLoad.SYNTHESIS: re.compile(r"\b(design|create|write|compose|propose|plan)\b", re.I),
    CognitiveLoad.EVALUATION: re.compile(r"\b(evaluate|judge|critique|assess|recommend|which is better)\b", re.I),
}


@dataclass
class TaskClassifier:
    """Regex-vocabulary classifier (reference task_taxonomy.py:95+)."""

    def classify(self, prompt: str) -> TaskCharacteristics:
        signals: dict[str, float] = {}

        # domain: highest pattern-hit count wins, GENERAL as fallback
        best_domain, best_score = TaskDomain.GENERAL, 0.0
        for domain, patterns in _DOMAIN_PATTERNS.items():
            score = sum(len(p.findall(prompt)) for p in patterns)
            signals[f"domain_{domain.value}"] = float(score)
            if score > best_score:
                best_domain, best_score = domain, score

        # complexity: length + hard/easy markers
        words = len(prompt.split())
        level = 1 + min(int(math.log2(max(words, 1)) / 2), 2)  # 1..3 from length
        level += 2 if _COMPLEXITY_HARD.search(prompt) else 0
        level -= 1 if _COMPLEXITY_EASY.search(prompt) else 0
        complexity = TaskComplexity(min(max(level, 1), 5))

        # cognitive load: first matching level from highest to lowest
        load = CognitiveLoad.COMPREHENSION
        for candidate in reversed(list(CognitiveLoad)):
            if _LOAD_PATTERNS[candidate].search(prompt):
                load = candidate
                break

        requires_precision = best_domain in (TaskDomain.MATH, TaskDomain.CODE) or bool(
            re.search(r"\b(exact|precise|accurate|correct)\b", prompt, re.I)
        )
        est_tokens = max(16, min(words * 4, 1024))
        confidence = min(1.0, 0.3 + 0.1 * best_score)
        return TaskCharacteristics(
            domain=best_domain,
            complexity=complexity,
            cognitive_load=load,
            estimated_tokens=est_tokens,
            requires_precision=requires_precision,
            confidence=confidence,
            signals=signals,
        )

    def recommend_stage(self, chars: TaskCharacteristics, n_stages: int = 4) -> int:
        """Initial-tier hint: complexity maps to the hierarchy; precision-
        critical tasks start one tier up (reference's '70B enhancement'
        patterns, serving_config.py:55-63)."""
        frac = (chars.complexity.value - 1) / 4.0
        stage = int(round(frac * (n_stages - 1)))
        if chars.requires_precision:
            stage = min(stage + 1, n_stages - 1)
        return stage


AdvancedTaskClassifier = TaskClassifier  # reference-compatible alias
