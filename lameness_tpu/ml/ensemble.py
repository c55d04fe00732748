"""Tabular GBDT ensemble — the ml-pipeline's CatBoost/XGBoost/LightGBM trio.

Behavioral rebuild of ``services/ml-pipeline/app/main.py:72-114,241-303``:
three named boosted models + a weighted ensemble whose weights come from
``ensemble_weights.json``.  GBDT inference stays on host, bit-stable
(SURVEY.md §2.7) — this is deliberately NOT a TPU workload.

Reference model FILES (``xgboost_latest.json`` / ``lightgbm_latest.txt``)
load and predict exactly via the pure-numpy tree evaluators in
:mod:`lameness_tpu.ml.gbdt_io` — no C++ library needed; ``.cbm`` needs the
catboost lib.  For TRAINING, native libraries are used when installed;
otherwise :mod:`lameness_tpu.ml.gbdt_train` implements each library's
own algorithm in numpy (XGBoost exact-greedy depthwise, LightGBM
leafwise, CatBoost oblivious trees) and ``save()`` writes the xgboost /
lightgbm slots in the REFERENCE's model-file formats
(``xgboost_latest.json`` / ``lightgbm_latest.txt``) — artifacts the
reference's own ml-pipeline loaders accept.  The oblivious catboost
model persists via joblib (``.cbm`` is not writable without the lib).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import joblib
import numpy as np

MODEL_SLOTS = ("catboost", "xgboost", "lightgbm")
DEFAULT_WEIGHTS = {"catboost": 0.35, "xgboost": 0.35, "lightgbm": 0.30}


def _make_model(slot: str, params: Optional[Dict[str, Any]] = None):
    """Construct the best available backend for a slot: the native library
    when installed, else the numpy trainer in that library's own style
    (gbdt_train.make_numpy_model)."""
    params = params or {}
    # reference defaults: 100 boosting rounds across all three
    # models (routers/ml_config.py:26-96, training-service:204-224)
    n_estimators = params.get("n_estimators", 100)
    lr = params.get("learning_rate", 0.1)
    depth = params.get("max_depth", 6)
    if slot == "catboost":
        try:
            from catboost import CatBoostClassifier  # type: ignore
            return CatBoostClassifier(iterations=n_estimators,
                                      learning_rate=lr, depth=depth,
                                      verbose=False)
        except ImportError:
            pass
    elif slot == "xgboost":
        try:
            from xgboost import XGBClassifier  # type: ignore
            return XGBClassifier(n_estimators=n_estimators, learning_rate=lr,
                                 max_depth=depth, eval_metric="logloss")
        except ImportError:
            pass
    elif slot == "lightgbm":
        try:
            from lightgbm import LGBMClassifier  # type: ignore
            return LGBMClassifier(n_estimators=n_estimators, learning_rate=lr,
                                  max_depth=depth, verbose=-1)
        except ImportError:
            pass
    else:
        raise ValueError(slot)
    from .gbdt_train import make_numpy_model
    return make_numpy_model(slot, dict(params, n_estimators=n_estimators,
                                       learning_rate=lr, max_depth=depth))


class GBDTEnsemble:
    """Three-slot boosted ensemble with the reference's predict() contract."""

    def __init__(self, models_dir: Path,
                 params: Optional[Dict[str, Dict[str, Any]]] = None):
        self.models_dir = Path(models_dir)
        self.models_dir.mkdir(parents=True, exist_ok=True)
        self.params = params or {}
        self.models: Dict[str, Any] = {}
        self.ensemble_weights: Dict[str, float] = dict(DEFAULT_WEIGHTS)
        self.load()

    # -- persistence ---------------------------------------------------------
    def _slot_path(self, slot: str) -> Path:
        return self.models_dir / f"{slot}_latest.joblib"

    def load(self) -> None:
        from .gbdt_io import load_reference_model
        for slot in MODEL_SLOTS:
            # the reference's own model-file formats take precedence:
            # xgboost_latest.json / lightgbm_latest.txt load via the
            # pure-numpy readers (exact tree evaluation, no C++ libs),
            # catboost_latest.cbm via the catboost lib when installed
            try:
                ref = load_reference_model(self.models_dir, slot)
            except Exception:
                ref = None
            if ref is not None:
                self.models[slot] = ref
                continue
            p = self._slot_path(slot)
            if p.exists():
                try:
                    self.models[slot] = joblib.load(p)
                except Exception:
                    pass
        w = self.models_dir / "ensemble_weights.json"
        if w.exists():
            try:
                self.ensemble_weights = json.load(open(w))
            except Exception:
                pass

    def save(self, feature_names: Optional[List[str]] = None) -> None:
        """Persist every slot.  Numpy-trained xgboost/lightgbm models are
        written in the REFERENCE's model-file formats (xgboost_latest.json
        / lightgbm_latest.txt — what the reference's ml-pipeline loads and
        what load() prefers, via the exact gbdt_io readers); everything
        also gets a joblib dump as the fallback."""
        from .gbdt_io import CATBOOST_JSON, REFERENCE_FILES
        from .gbdt_train import BoostedTreesClassifier
        for slot, model in self.models.items():
            if isinstance(model, BoostedTreesClassifier):
                if slot == "xgboost":
                    model.save_xgboost_json(
                        self.models_dir / REFERENCE_FILES[slot],
                        feature_names=feature_names)
                elif slot == "lightgbm":
                    model.save_lightgbm_txt(
                        self.models_dir / REFERENCE_FILES[slot],
                        feature_names=feature_names)
                elif slot == "catboost" and model.growth == "oblivious":
                    # .cbm is not writable without the lib; the JSON
                    # export format is (and load() reads it back)
                    model.save_catboost_json(
                        self.models_dir / CATBOOST_JSON,
                        feature_names=feature_names)
            joblib.dump(model, self._slot_path(slot))
        from ..io import schemas
        schemas.write_result(self.models_dir / "ensemble_weights.json",
                             self.ensemble_weights)

    # -- training ------------------------------------------------------------
    def fit(self, x: np.ndarray, y: np.ndarray, cv_folds: int = 5,
            feature_names: Optional[List[str]] = None) -> Dict[str, Any]:
        """Train all slots with stratified CV accuracy reporting
        (training-service/app/main.py:193-293)."""
        from sklearn.model_selection import StratifiedKFold, cross_val_score
        report: Dict[str, Any] = {"models": {}}
        n_splits = min(cv_folds, int(np.bincount(y.astype(int)).min()))
        for slot in MODEL_SLOTS:
            model = _make_model(slot, self.params.get(slot))
            if n_splits >= 2:
                skf = StratifiedKFold(n_splits=n_splits, shuffle=True,
                                      random_state=42)
                scores = cross_val_score(model, x, y, cv=skf,
                                         scoring="accuracy")
                report["models"][slot] = {
                    "cv_accuracy_mean": float(scores.mean()),
                    "cv_accuracy_std": float(scores.std()),
                }
            else:
                report["models"][slot] = {"cv_accuracy_mean": None,
                                          "cv_accuracy_std": None}
            report["models"][slot]["backend"] = type(model).__name__
            model.fit(x, y)
            self.models[slot] = model
        self.save(feature_names=feature_names)
        report["num_samples"] = int(len(y))
        report["class_balance"] = {str(c): int(n) for c, n in
                                   zip(*np.unique(y, return_counts=True))}
        return report

    # -- inference -----------------------------------------------------------
    def predict(self, features: np.ndarray) -> Dict[str, Any]:
        """Per-model probabilities + weighted ensemble (ml:241-303).  Missing
        models are skipped; with none loaded the ensemble defaults to 0.5."""
        if features.ndim == 1:
            features = features.reshape(1, -1)
        predictions: Dict[str, Any] = {}
        for slot in MODEL_SLOTS:
            model = self.models.get(slot)
            if model is None:
                continue
            try:
                proba = float(model.predict_proba(features)[0, 1])
            except Exception:
                continue
            predictions[slot] = {"probability": proba,
                                 "prediction": int(proba > 0.5)}
        ens = 0.0
        total_w = 0.0
        for slot, w in self.ensemble_weights.items():
            if slot in predictions:
                ens += predictions[slot]["probability"] * w
                total_w += w
        ens = ens / total_w if total_w > 0 else 0.5
        predictions["ensemble"] = {"probability": float(ens),
                                   "prediction": int(ens > 0.5),
                                   "weights": self.ensemble_weights}
        return predictions

    @property
    def has_models(self) -> bool:
        return bool(self.models)
