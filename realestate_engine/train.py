"""Model training (SURVEY.md §2.9 M9-M12; reference:
src/models/train.py:20-24,87-119,152-246).

Reproduces the reference's trainer — RF/LR/GBT regressors, per-model
CV grids, save/load with JSON metadata — with bug B1 FIXED: training
runs on ``log_price`` and predictions are inverted once via the
TargetTransformer (the reference trained on raw price yet applied the
log-inverse at serving, src/models/train.py:90 + src/webapp/app.py:99,
which is why its shipped predictions.csv is full of inf).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.regression import (
    GBTRegressor,
    GBTRegressionModel,
    LinearRegression,
    LinearRegressionModel,
    RandomForestRegressionModel,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

from realestate_engine.metrics import evaluate

SEED = 42

_MODEL_CLASSES = {
    "rf": (RandomForestRegressor, RandomForestRegressionModel),
    "lr": (LinearRegression, LinearRegressionModel),
    "gbt": (GBTRegressor, GBTRegressionModel),
}


def _make_estimator(model_type: str, label_col: str):
    cls = _MODEL_CLASSES[model_type][0]
    kwargs = {"featuresCol": "features", "labelCol": label_col, "predictionCol": "prediction"}
    if model_type in ("rf", "gbt"):
        kwargs["seed"] = SEED
    return cls(**kwargs)


def _param_grid(est, model_type: str, small: bool = True):
    """CV grids mirroring src/models/train.py:231-246 (small=True keeps
    the notebook-scale grids tractable for tests/bench)."""
    b = ParamGridBuilder()
    if model_type == "rf":
        b = b.addGrid(est.numTrees, [10, 20] if small else [20, 50, 100])
        b = b.addGrid(est.maxDepth, [5] if small else [5, 10])
    elif model_type == "gbt":
        b = b.addGrid(est.maxDepth, [3] if small else [5, 10])
        b = b.addGrid(est.maxIter, [5, 10] if small else [10, 50])
    else:
        b = b.addGrid(est.regParam, [0.1, 1.0])
        b = b.addGrid(est.elasticNetParam, [0.0, 1.0])
    return b.build()


class ModelTrainer:
    """Train/evaluate/persist one of rf|lr|gbt on log-space labels."""

    def __init__(self, model_type: str = "rf", label_col: str = "log_price"):
        if model_type not in _MODEL_CLASSES:
            raise ValueError(f"unknown model type {model_type!r}")
        self.model_type = model_type
        self.label_col = label_col
        self.model = None
        self.best_params: dict = {}

    def train(self, train_df: DataFrame, use_cv: bool = False, num_folds: int = 3) -> "ModelTrainer":
        est = _make_estimator(self.model_type, self.label_col)
        if use_cv:
            cv = CrossValidator(
                estimator=est,
                estimatorParamMaps=_param_grid(est, self.model_type),
                evaluator=RegressionEvaluator(labelCol=self.label_col, metricName="rmse"),
                numFolds=num_folds,
                seed=SEED,
                parallelism=4,
            )
            cv_model = cv.fit(train_df)
            self.model = cv_model.bestModel
            self.best_params = {
                p.name: v for p, v in self.model.extractParamMap().items() if p.name in
                ("numTrees", "maxDepth", "maxIter", "regParam", "elasticNetParam", "minInstancesPerNode")
            }
        else:
            self.model = est.fit(train_df)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        if self.model is None:
            raise RuntimeError("model is not trained")
        return self.model.transform(df)

    def evaluate(self, df: DataFrame) -> dict[str, float]:
        return evaluate(self.predict(df), label_col=self.label_col)

    def feature_importances(self) -> list[float]:
        if self.model is None or not hasattr(self.model, "featureImportances"):
            return []
        return list(self.model.featureImportances.toArray())

    def save(self, path: str) -> None:
        if self.model is None:
            raise RuntimeError("nothing to save: not trained")
        self.model.write().overwrite().save(os.path.join(path, "model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {"model_type": self.model_type, "label_col": self.label_col, "best_params": self.best_params},
                f,
                indent=2,
            )

    @classmethod
    def load(cls, path: str) -> "ModelTrainer":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        trainer = cls(model_type=meta["model_type"], label_col=meta["label_col"])
        trainer.best_params = meta.get("best_params", {})
        trainer.model = _MODEL_CLASSES[meta["model_type"]][1].load(os.path.join(path, "model"))
        return trainer
