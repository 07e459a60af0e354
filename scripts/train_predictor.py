#!/usr/bin/env python
"""Quality-predictor training pipeline.

Role parity: reference ``scripts/train_predictor.py`` (data generation, k-fold
CV, early stopping, checkpoints, metrics report) + ensemble training
(``src/models/enhanced_predictor.py`` demo).

Data sources:
  --synthetic            difficulty-model generator (default; no weights)
  --data FILE            training_data.json from predict.data.save_samples
(real-cascade generation lives in predict.data.generate_from_engines; wire it
via scripts/generate_data.py once weights are on disk).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from adaptive_sd_tpu.config import ConfigManager, TrainingConfig
from adaptive_sd_tpu.predict import (
    EnsembleQualityPredictor,
    MLPQualityPredictor,
    generate_synthetic,
    load_samples,
)
from adaptive_sd_tpu.utils import setup_logging


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-dir", default="configs")
    ap.add_argument("--synthetic", action="store_true", default=True)
    ap.add_argument("--data", default="", help="training_data.json path")
    ap.add_argument("--n-prompts", type=int, default=None)
    ap.add_argument("--predictor", choices=("mlp", "ensemble"), default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    setup_logging("INFO")
    cfg = ConfigManager(args.config_dir).load("training", TrainingConfig)
    kind = args.predictor or cfg.predictor.predictor
    out = args.out or cfg.predictor.checkpoint_path
    n_prompts = args.n_prompts or min(cfg.data.n_prompts, 5000)

    texts = None
    if args.data:
        X, y, texts = load_samples(args.data, with_texts=True)
        quality = y
    else:
        X, y, quality = generate_synthetic(
            n_prompts=n_prompts, quality_threshold=cfg.data.quality_threshold
        )
    print(f"training data: X={X.shape} positives={y.mean():.3f}")

    if kind == "mlp":
        model = MLPQualityPredictor(
            feature_dim=cfg.predictor.feature_dim, hidden=cfg.predictor.hidden
        )
        report = model.fit(
            X,
            y,
            epochs=cfg.predictor.epochs,
            batch_size=cfg.predictor.batch_size,
            lr=cfg.predictor.lr,
            weight_decay=cfg.predictor.weight_decay,
            patience=cfg.predictor.patience,
            k_fold=cfg.predictor.k_fold,
            texts=texts,  # real-data runs train the text-embedding block too
        )
        model.save(out)
        summary = {
            "predictor": "mlp",
            "val_auc": report.val_auc,
            "val_r2": report.val_r2,
            "epochs_run": report.epochs_run,
            "best_epoch": report.best_epoch,
            "train_time_s": report.train_time_s,
            "folds": report.fold_metrics,
            "checkpoint": out,
        }
    else:
        model = EnsembleQualityPredictor(feature_dim=cfg.predictor.feature_dim)
        scores = model.fit(X, quality)
        out = str(pathlib.Path(out).with_suffix(".pkl"))
        model.save(out)
        summary = {
            "predictor": "ensemble",
            "member_r2": scores,
            "weights": model.weights,
            "checkpoint": out,
        }

    print(json.dumps(summary, indent=1, default=float))


if __name__ == "__main__":
    main()
