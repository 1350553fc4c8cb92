"""Regression metrics (SURVEY.md §2.9 M11; reference:
src/models/train.py:126-150).

Two forms with identical semantics:
- ``evaluate``: spark.ml RegressionEvaluator (rmse/r2/mae);
- ``metrics_df``: the same three metrics as ONE pure-SQL aggregate —
  oracle-checkable, and one job instead of three evaluator jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.evaluation import RegressionEvaluator


def evaluate(predictions: DataFrame, label_col: str, prediction_col: str = "prediction") -> dict[str, float]:
    out = {}
    for metric in ("rmse", "r2", "mae"):
        ev = RegressionEvaluator(labelCol=label_col, predictionCol=prediction_col, metricName=metric)
        out[metric] = float(ev.evaluate(predictions))
    return out


def metrics_df(predictions: DataFrame, label_col: str, prediction_col: str = "prediction") -> DataFrame:
    """rmse/mae/r2 in a single distributed aggregate.

    r2 = 1 - SS_res/SS_tot is expanded so everything folds into ONE
    aggregation pass: SS_tot = Σy² - (Σy)²/n.
    """
    y = F.col(label_col)
    err = y - F.col(prediction_col)
    agg = predictions.agg(
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.sum(err * err).alias("ss_res"),
        F.sum(y * y).alias("sum_y2"),
        F.sum(y).alias("sum_y"),
        F.count(F.lit(1)).alias("n"),
    )
    ss_tot = F.col("sum_y2") - (F.col("sum_y") * F.col("sum_y")) / F.col("n")
    return agg.select(
        F.sqrt("mse").alias("rmse"),
        F.col("mae"),
        (1 - F.col("ss_res") / ss_tot).alias("r2"),
    )
