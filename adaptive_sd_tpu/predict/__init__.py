from .data import (
    TrainingSample,
    generate_from_engines,
    generate_synthetic,
    load_samples,
    ngram_similarity,
    save_samples,
)
from .ensemble import EnsembleQualityPredictor
from .features import FEATURE_DIM, extract_batch, extract_features
from .mlp import MLPQualityPredictor, TrainReport, mlp_forward

__all__ = [name for name in dir() if not name.startswith("_")]
