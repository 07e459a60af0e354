from .baselines import (
    BaselinePolicy,
    BaselineReport,
    CascadeBaseline,
    FixedStageBaseline,
    OracleBaseline,
    RandomBaseline,
    ThresholdBaseline,
    default_baseline_suite,
    evaluate_baselines,
    stage_quality,
)
from .quality import (
    ComprehensiveQualityEvaluator,
    bleu,
    creativity_score,
    factual_consistency,
    math_accuracy,
    reasoning_score,
    rouge_l,
    rouge_n,
    token_f1,
)
from .stats import (
    RigorousEvaluator,
    StatisticalResult,
    generate_publication_table,
)
from .sweep import EvalSample, LambdaSweepHarness, SweepPoint, synthetic_dataset

__all__ = [name for name in dir() if not name.startswith("_")]
