from .data import (
    TrainingSample,
    generate_from_engines,
    generate_synthetic,
    load_samples,
    ngram_similarity,
    save_samples,
)
from .embed import EMBED_LEN, EMBED_VOCAB, hash_batch, hash_indices
from .ensemble import EnsembleQualityPredictor
from .features import FEATURE_DIM, extract_batch, extract_features
from .mlp import MLPQualityPredictor, TrainReport, mlp_forward, mlp_forward_embed

__all__ = [name for name in dir() if not name.startswith("_")]
