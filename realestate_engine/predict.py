"""Batch and single-row inference (SURVEY.md §2.9 M13; reference:
src/inference/predict.py:14-62, src/webapp/app.py:68-112).

Composition: FeatureEngineering.transform (permissive mode) → model
transform → smearing inverse → (id, predicted price). Single-row
prediction reuses the exact same path via a 1-row DataFrame with the
explicit 27-field schema — no separate code path to drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.features import FeatureEngineering
from realestate_engine.schemas import LISTINGS_SCHEMA
from realestate_engine.target import TargetTransformer
from realestate_engine.train import ModelTrainer


def predict_batch(
    df: DataFrame,
    fe: FeatureEngineering,
    trainer: ModelTrainer,
    tt: TargetTransformer,
    id_col: str = "id_annonce",
) -> DataFrame:
    """df(listings) → (id, predicted_price). Fully lazy: one plan, no
    intermediate actions (the reference ran 4 audit count() jobs per
    upload, src/webapp/app.py:74-101)."""
    feats = fe.transform(df)
    preds = trainer.predict(feats)
    out = tt.inverse_transform(preds, prediction_col="prediction")
    return out.select(F.col(id_col), F.col("prediction_price").alias("predicted_price"))


def predict_single(
    spark: SparkSession,
    record: dict,
    fe: FeatureEngineering,
    trainer: ModelTrainer,
    tt: TargetTransformer,
) -> DataFrame:
    """Single-row prediction through the batch path (reference:
    src/inference/predict.py:62 createDataFrame([dict], schema))."""
    row = tuple(record.get(f.name) for f in LISTINGS_SCHEMA.fields)
    df = spark.createDataFrame([row], LISTINGS_SCHEMA)
    return predict_batch(df, fe, trainer, tt)
