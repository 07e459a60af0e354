"""Tests for the predictor layer: features, MLP training, ensemble, data gen."""

import numpy as np
import pytest

from adaptive_sd_tpu.predict import (
    FEATURE_DIM,
    EnsembleQualityPredictor,
    MLPQualityPredictor,
    extract_features,
    generate_synthetic,
    ngram_similarity,
)


class TestFeatures:
    def test_shape_and_finite(self):
        f = extract_features("What is 2+2?", "4", np.asarray([-0.1, -0.2]), 0)
        assert f.shape == (FEATURE_DIM,) and np.all(np.isfinite(f))

    def test_handles_missing_logprobs(self):
        f = extract_features("prompt", "draft", None, 1)
        assert f.shape == (FEATURE_DIM,)

    def test_stage_onehot_differs(self):
        f0 = extract_features("p", "d", None, 0)
        f2 = extract_features("p", "d", None, 2)
        assert not np.array_equal(f0, f2)

    def test_confident_logprobs_move_features(self):
        good = extract_features("p", "d", np.full(20, -0.1), 0)
        bad = extract_features("p", "d", np.full(20, -5.0), 0)
        assert good[16] > bad[16]  # mean logprob feature

    def test_task_indicators(self):
        f_code = extract_features("def foo(): return 1", "x", None, 0)
        f_plain = extract_features("hello there friend", "x", None, 0)
        assert f_code[32] == 1.0 and f_plain[32] == 0.0


class TestNgramSimilarity:
    def test_identical(self):
        assert ngram_similarity("the cat sat on the mat", "the cat sat on the mat") > 0.99

    def test_disjoint(self):
        assert ngram_similarity("alpha beta gamma delta", "one two three four") < 0.01

    def test_partial_ordering(self):
        ref = "the quick brown fox jumps over the lazy dog"
        close = "the quick brown fox jumps over a lazy dog"
        far = "a completely different sentence here now"
        assert ngram_similarity(close, ref) > ngram_similarity(far, ref)

    def test_empty(self):
        assert ngram_similarity("", "x") == 0.0


class TestMLPPredictor:
    def test_learns_synthetic_signal(self):
        X, y, _ = generate_synthetic(n_prompts=300, seed=1)
        m = MLPQualityPredictor()
        rep = m.fit(X, y, epochs=30, patience=5)
        assert rep.val_auc > 0.8, f"AUC too low: {rep.val_auc}"
        assert rep.epochs_run >= 1

    def test_predict_interface(self):
        m = MLPQualityPredictor()
        r = m.predict("What is 2+2?", "4", np.asarray([-0.1]), 0)
        assert 0.0 <= r.quality_score <= 1.0
        assert r.prediction_time_s < 0.5

    def test_save_load_roundtrip(self, tmp_path):
        X, y, _ = generate_synthetic(n_prompts=100, seed=2)
        m = MLPQualityPredictor()
        m.fit(X, y, epochs=5, patience=3)
        p = str(tmp_path / "pred.npz")
        m.save(p)
        m2 = MLPQualityPredictor.load(p)
        np.testing.assert_allclose(
            m.predict_features(X[:8]), m2.predict_features(X[:8]), rtol=1e-5
        )

    def test_kfold_reports(self):
        X, y, _ = generate_synthetic(n_prompts=100, seed=3)
        m = MLPQualityPredictor()
        rep = m.fit(X, y, epochs=5, patience=3, k_fold=3)
        assert len(rep.fold_metrics) == 3


class TestLearnedEmbedding:
    """The learned text-embedding block (reference parity: DistilBERT dims
    appended to handcrafted features, enhanced_predictor.py:54-245 — here
    trained jointly since no pretrained weights exist offline)."""

    def test_hash_indices_deterministic_and_masked(self):
        from adaptive_sd_tpu.predict import EMBED_LEN, EMBED_VOCAB, hash_indices

        i1, m1 = hash_indices("What is the capital of France?", "Paris")
        i2, m2 = hash_indices("What is the capital of France?", "Paris")
        np.testing.assert_array_equal(i1, i2)
        assert i1.shape == (EMBED_LEN,) and m1.shape == (EMBED_LEN,)
        assert i1.max() < EMBED_VOCAB and i1[m1 > 0].min() >= 1  # 0 = pad
        i3, _ = hash_indices("Completely different prompt text", "nope")
        assert not np.array_equal(i1, i3)

    def _text_only_task(self, n=400, seed=0):
        """Labels depend ONLY on the text — handcrafted features carry no
        signal, so any learning must come through the embedding."""
        rng = np.random.default_rng(seed)
        X = rng.normal(0, 1, size=(n, FEATURE_DIM)).astype(np.float32)
        texts, y = [], []
        for i in range(n):
            good = i % 2 == 0
            word = "reliable" if good else "dubious"
            texts.append((f"question about {word} topic {i}", f"answer {i}"))
            y.append(float(good))
        return X, np.asarray(y, np.float32), texts

    def test_embedding_learns_text_only_signal(self):
        X, y, texts = self._text_only_task()
        m = MLPQualityPredictor(embed_dim=16)
        # small batches: an embedding trained from scratch needs optimizer
        # steps, not epochs (batch 256 on 340 rows = 1 step/epoch)
        rep = m.fit(X, y, epochs=80, patience=20, batch_size=32, texts=texts)
        assert rep.val_auc > 0.9, f"embedding failed to learn: {rep.val_auc}"
        # on FRESH items (unseen random features) only the text path carries
        # signal: blind predictions are chance, text predictions generalise
        Xf, yf, tf = self._text_only_task(n=100, seed=99)
        blind_acc = ((m.predict_features(Xf) > 0.5) == (yf > 0.5)).mean()
        text_acc = ((m.predict_features(Xf, texts=tf) > 0.5) == (yf > 0.5)).mean()
        assert text_acc > 0.85
        assert text_acc > blind_acc + 0.2

    def test_dense_only_cannot_learn_text_task(self):
        X, y, texts = self._text_only_task(seed=1)
        m = MLPQualityPredictor(embed_dim=0)
        rep = m.fit(X, y, epochs=15, patience=5, texts=texts)  # texts ignored
        assert rep.val_auc < 0.75  # random features, no text path

    def test_save_load_preserves_embedding(self, tmp_path):
        X, y, texts = self._text_only_task(n=120, seed=2)
        m = MLPQualityPredictor(embed_dim=8)
        m.fit(X, y, epochs=5, patience=3, texts=texts)
        p = str(tmp_path / "embed_pred.npz")
        m.save(p)
        m2 = MLPQualityPredictor.load(p)
        assert m2.embed_dim == 8
        np.testing.assert_allclose(
            m.predict_features(X[:8], texts=texts[:8]),
            m2.predict_features(X[:8], texts=texts[:8]),
            rtol=1e-5,
        )

    def test_platt_recovers_overconfidence(self):
        from adaptive_sd_tpu.predict.mlp import _fit_platt

        rng = np.random.default_rng(0)
        p_true = rng.uniform(0.05, 0.95, 4000)
        y = (rng.random(4000) < p_true).astype(np.float32)
        logit = np.log(p_true / (1 - p_true))
        p_over = 1.0 / (1.0 + np.exp(-3.0 * logit))  # overconfident model
        a, b = _fit_platt(p_over, y)
        assert 0.25 < a < 0.45  # recovers ~1/3
        z = np.log(np.clip(p_over, 1e-7, 1 - 1e-7) / (1 - np.clip(p_over, 1e-7, 1 - 1e-7)))
        p_cal = 1.0 / (1.0 + np.exp(-(a * z + b)))
        brier_raw = np.mean((p_over - y) ** 2)
        brier_cal = np.mean((p_cal - y) ** 2)
        assert brier_cal < brier_raw

    def test_fit_with_calibrate_flag(self):
        X, y, _ = generate_synthetic(n_prompts=200, seed=7)
        m = MLPQualityPredictor()
        m.fit(X, y, epochs=10, patience=4, calibrate=True)
        p = m.predict_features(X[:20])
        assert np.all((p >= 0) & (p <= 1))

    def test_per_stage_calibration_groups_and_ece(self):
        """calibrate=True fits per-(stage, draftless) Platt groups, reports
        per-group ECE, and the grouped apply path matches a manual logit
        transform."""
        from adaptive_sd_tpu.predict.features import extract_features
        from adaptive_sd_tpu.predict.mlp import _ece

        X, y, _ = generate_synthetic(n_prompts=300, seed=9)
        # add draft-less rows (stage 0 and 1) so the draftless groups exist
        rng = np.random.default_rng(0)
        Xp = np.stack([
            extract_features(f"prompt {i} " + "w " * int(rng.integers(3, 30)),
                             "", None, int(i % 2), n_stages=4)
            for i in range(200)
        ])
        yp = (rng.random(200) < 0.6).astype(np.float32)
        m = MLPQualityPredictor()
        rep = m.fit(np.vstack([X, Xp]), np.concatenate([y, yp]),
                    epochs=10, patience=4, calibrate=True)
        assert rep.calibration_report, "report must list calibration groups"
        keys = {(r["stage"], r["draftless"]) for r in rep.calibration_report}
        assert any(dl == 1 for _, dl in keys), "draftless groups present"
        assert any(dl == 0 for _, dl in keys), "draft groups present"
        for r in rep.calibration_report:
            assert set(r) >= {"stage", "draftless", "n", "a", "b",
                              "ece_before", "ece_after"}
        # grouped apply matches the manual per-group transform
        groups = m._groups_of(X[:32])
        p = m.predict_features(X[:32])
        m2 = MLPQualityPredictor()
        m2.params, m2.mean, m2.std = m.params, m.mean, m.std
        m2._np_cache = None
        raw = m2.predict_features(X[:32])  # uncalibrated twin
        for i in range(32):
            key = (int(groups[i, 0]), int(groups[i, 1]))
            a, b = m.group_calibration.get(key, m.calibration)
            z = np.log(np.clip(raw[i], 1e-7, 1 - 1e-7)
                       / np.clip(1 - raw[i], 1e-7, 1))
            assert p[i] == pytest.approx(1 / (1 + np.exp(-(a * z + b))), rel=1e-5)
        # ECE sanity: perfect predictions -> 0, constant-wrong -> large
        assert _ece(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == 0.0
        assert _ece(np.ones(100), np.full(100, 0.1)) > 0.8

    def test_group_calibration_save_load(self, tmp_path):
        X, y, _ = generate_synthetic(n_prompts=200, seed=11)
        m = MLPQualityPredictor()
        rep = m.fit(X, y, epochs=8, patience=4, calibrate=True)
        # groups are reported even when ECE selection keeps the pooled fit
        # (group_calibration only stores entries that BEAT the pooled fit)
        assert rep.calibration_report
        p = str(tmp_path / "cal_pred.npz")
        m.save(p)
        m2 = MLPQualityPredictor.load(p)
        assert m2.group_calibration == m.group_calibration
        np.testing.assert_allclose(
            m.predict_features(X[:16]), m2.predict_features(X[:16]), rtol=1e-5
        )

    def test_feature_only_callers_unaffected(self):
        """fit/predict without texts behaves like a dense MLP (zero-masked
        embedding) — the serving fallback path."""
        X, y, _ = generate_synthetic(n_prompts=150, seed=4)
        m = MLPQualityPredictor()  # embed_dim default on
        rep = m.fit(X, y, epochs=20, patience=5)
        assert rep.val_auc > 0.8


class TestEnsemble:
    def test_fit_predict_uncertainty(self):
        X, y, q = generate_synthetic(n_prompts=200, seed=4)
        e = EnsembleQualityPredictor()
        scores = e.fit(X, q)
        assert set(scores) == {"random_forest", "gbm", "mlp", "ridge"}
        mean, std = e.predict_features(X[:16])
        assert mean.shape == (16,) and np.all((mean >= 0) & (mean <= 1))
        assert np.all(std >= 0)

    def test_weights_normalized(self):
        X, y, q = generate_synthetic(n_prompts=150, seed=5)
        e = EnsembleQualityPredictor()
        e.fit(X, q)
        assert sum(e.weights.values()) == pytest.approx(1.0)

    def test_save_load(self, tmp_path):
        X, y, q = generate_synthetic(n_prompts=100, seed=6)
        e = EnsembleQualityPredictor()
        e.fit(X, q)
        p = str(tmp_path / "ens.pkl")
        e.save(p)
        e2 = EnsembleQualityPredictor.load(p)
        m1, _ = e.predict_features(X[:4])
        m2, _ = e2.predict_features(X[:4])
        np.testing.assert_allclose(m1, m2)

    def test_unfitted_raises(self):
        from adaptive_sd_tpu.core.exceptions import PredictionError

        with pytest.raises(PredictionError):
            EnsembleQualityPredictor().predict_features(np.zeros((1, FEATURE_DIM)))


class TestGenerateFromEngines:
    def test_real_cascade_data_generation(self, tmp_path):
        """generate_from_engines runs every tier, labels drafts by similarity
        to the largest tier's output, and round-trips through save/load."""
        import jax
        import jax.numpy as jnp

        from adaptive_sd_tpu.engine import TierEngine
        from adaptive_sd_tpu.models import TINY, init_params
        from adaptive_sd_tpu.predict import (
            generate_from_engines,
            load_samples,
            save_samples,
        )

        engines = [
            TierEngine(TINY, init_params(TINY, jax.random.key(i), jnp.float32),
                       page_size=16, n_pages=128, use_pallas=False)
            for i in range(2)
        ]

        def tok(t):
            return [(ord(c) % 255) + 1 for c in t[:24]] or [1]

        def detok(ids):
            return " ".join(str(i) for i in ids)

        samples = generate_from_engines(
            ["first prompt", "second prompt"], engines, tok, detok,
            max_new=6, costs=[1.0, 4.0],
        )
        # 2 prompts x 2 stages x (draft row + prompt-only row)
        assert len(samples) == 8
        last = [s for s in samples if s.stage_index == 1]
        assert all(s.quality == 1.0 and s.label == 1 for s in last)
        assert all(len(s.features) == 64 for s in samples)
        # prompt-only rows (prefetch + prompt-conditional prior scoring)
        # cover EVERY stage, carrying that stage's label
        prompt_only = [s for s in samples if s.draft == ""]
        assert len(prompt_only) == 4
        assert sorted({s.stage_index for s in prompt_only}) == [0, 1]

        plain = generate_from_engines(
            ["first prompt"], engines, tok, detok, max_new=6,
            include_prompt_only=False,
        )
        assert len(plain) == 2

        p = str(tmp_path / "data.json")
        save_samples(samples, p)
        X, y = load_samples(p)
        assert X.shape == (8, 64) and y.shape == (8,)
