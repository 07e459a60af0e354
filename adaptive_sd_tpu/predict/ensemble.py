"""Ensemble quality predictor (sklearn-based).

Role parity: reference ``EnsembleQualityPredictor``
(``src/models/enhanced_predictor.py:262-578``): RandomForest / GradientBoosting
/ MLP / Ridge members each with their own scaler, validation-R^2-weighted
averaging, cross-member uncertainty, feature importance, pickle persistence.
(LightGBM member dropped — not in this image; the GBM member covers the role.)
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..core.exceptions import PredictionError
from ..core.types import PredictionResult
from .features import FEATURE_DIM, extract_features


def _make_members(seed: int):
    from sklearn.ensemble import GradientBoostingRegressor, RandomForestRegressor
    from sklearn.linear_model import Ridge
    from sklearn.neural_network import MLPRegressor

    return {
        "random_forest": RandomForestRegressor(
            n_estimators=100, max_depth=12, random_state=seed, n_jobs=-1
        ),
        "gbm": GradientBoostingRegressor(
            n_estimators=100, max_depth=5, learning_rate=0.1, random_state=seed
        ),
        "mlp": MLPRegressor(
            hidden_layer_sizes=(128, 64), max_iter=500, early_stopping=True, random_state=seed
        ),
        "ridge": Ridge(alpha=1.0, random_state=seed),
    }


class EnsembleQualityPredictor:
    def __init__(self, feature_dim: int = FEATURE_DIM, n_stages: int = 4, seed: int = 0):
        self.feature_dim = feature_dim
        self.n_stages = n_stages
        self.seed = seed
        self.members: dict = {}
        self.scalers: dict = {}
        self.weights: dict[str, float] = {}
        self.fitted = False

    def fit(self, X: np.ndarray, y: np.ndarray, val_frac: float = 0.2) -> dict[str, float]:
        """Train every member; weights = clipped validation R^2
        (reference enhanced_predictor.py:424-461)."""
        from sklearn.preprocessing import StandardScaler

        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(len(X))
        n_val = max(int(len(X) * val_frac), 1)
        val_idx, tr_idx = perm[:n_val], perm[n_val:]

        scores: dict[str, float] = {}
        self.members = _make_members(self.seed)
        for name, model in self.members.items():
            scaler = StandardScaler().fit(X[tr_idx])
            model.fit(scaler.transform(X[tr_idx]), y[tr_idx])
            pred = model.predict(scaler.transform(X[val_idx]))
            ss_res = float(np.sum((y[val_idx] - pred) ** 2))
            ss_tot = float(np.sum((y[val_idx] - y[val_idx].mean()) ** 2)) or 1e-12
            r2 = 1.0 - ss_res / ss_tot
            self.scalers[name] = scaler
            scores[name] = r2
            self.weights[name] = max(r2, 0.01)
        total = sum(self.weights.values())
        self.weights = {k: v / total for k, v in self.weights.items()}
        self.fitted = True
        return scores

    def _predict_members(self, X: np.ndarray) -> dict[str, np.ndarray]:
        if not self.fitted:
            raise PredictionError("ensemble not fitted")
        X = np.atleast_2d(np.asarray(X, np.float64))
        return {
            name: np.clip(m.predict(self.scalers[name].transform(X)), 0.0, 1.0)
            for name, m in self.members.items()
        }

    def predict_features(self, X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Returns (weighted mean, cross-member std) per row."""
        preds = self._predict_members(X)
        stacked = np.stack(list(preds.values()))
        weights = np.asarray([self.weights[k] for k in preds])
        mean = np.einsum("m,mn->n", weights, stacked)
        return mean, stacked.std(axis=0)

    def predict(
        self,
        prompt: str,
        draft_output: str,
        draft_logprobs: Optional[np.ndarray],
        stage_index: int,
    ) -> PredictionResult:
        t0 = time.perf_counter()
        feats = extract_features(
            prompt, draft_output, draft_logprobs, stage_index, n_stages=self.n_stages
        )
        mean, std = self.predict_features(feats)
        return PredictionResult(
            quality_score=float(mean[0]),
            confidence=1.0 - float(std[0]),
            uncertainty=float(std[0]),
            features=feats,
            prediction_time_s=time.perf_counter() - t0,
            predictor_name="ensemble",
        )

    def predict_batch(self, items: Sequence) -> list[PredictionResult]:
        return [self.predict(*it) for it in items]

    def feature_importance(self) -> Optional[np.ndarray]:
        rf = self.members.get("random_forest")
        return getattr(rf, "feature_importances_", None)

    def save(self, path: str) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(
                {
                    "members": self.members,
                    "scalers": self.scalers,
                    "weights": self.weights,
                    "feature_dim": self.feature_dim,
                    "n_stages": self.n_stages,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "EnsembleQualityPredictor":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self = cls(blob["feature_dim"], blob["n_stages"])
        self.members = blob["members"]
        self.scalers = blob["scalers"]
        self.weights = blob["weights"]
        self.fitted = True
        return self
