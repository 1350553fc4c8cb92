"""Target transform, metrics, trainer, and inference composition tests
(reference: src/features/target_transformer.py, src/models/train.py,
src/inference/predict.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F
from pyspark.ml.feature import VectorAssembler

from realestate_engine.metrics import evaluate, metrics_df
from realestate_engine.target import TargetTransformer
from realestate_engine.train import ModelTrainer


@pytest.fixture(scope="module")
def price_df(spark):
    rows = [(i, float(100000 + 5000 * i + (i % 7) * 1234)) for i in range(1, 201)]
    return spark.createDataFrame(rows, "id long, price double")


def test_target_fit_transform_inverse(spark, price_df, tmp_path):
    tt = TargetTransformer().fit(price_df)
    assert tt.stats["original_count"] == 200
    transformed = tt.transform(price_df)
    row = transformed.filter(F.col("id") == 1).first()
    assert row.log_price == pytest.approx(math.log(row.price))

    # inverse applies the smearing correction exp(sigma^2/2)
    preds = transformed.withColumn("prediction", F.col("log_price"))
    inv = tt.inverse_transform(preds).first()
    corr = math.exp(tt.stats["log_std"] ** 2 / 2)
    assert inv.prediction_price == pytest.approx(inv.price * corr, rel=1e-9)

    # persistence round-trip
    p = str(tmp_path / "tt.json")
    tt.save(p)
    tt2 = TargetTransformer.load(p)
    assert tt2.stats == tt.stats


def test_target_unfitted_guards(price_df):
    tt = TargetTransformer()
    with pytest.raises(RuntimeError):
        tt.transform(price_df)
    with pytest.raises(RuntimeError):
        tt.inverse_transform(price_df)


def test_metrics_sql_matches_evaluator(spark, price_df):
    preds = price_df.withColumn("prediction", F.col("price") * 0.9 + 1000)
    ev = evaluate(preds, label_col="price")
    sql_row = metrics_df(preds, label_col="price").first()
    assert sql_row.rmse == pytest.approx(ev["rmse"], rel=1e-6)
    assert sql_row.mae == pytest.approx(ev["mae"], rel=1e-6)
    assert sql_row.r2 == pytest.approx(ev["r2"], rel=1e-6)


@pytest.fixture(scope="module")
def assembled(spark):
    rows = [(i, float(i % 13), float(i % 5), 12.0 + 0.01 * (i % 13) + 0.02 * (i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, log_price double")
    return VectorAssembler(inputCols=["f1", "f2"], outputCol="features").transform(df)


@pytest.mark.parametrize("model_type", ["rf", "lr", "gbt"])
def test_trainer_all_models_on_log_label(assembled, model_type, tmp_path):
    trainer = ModelTrainer(model_type=model_type).train(assembled)
    preds = trainer.predict(assembled)
    assert preds.count() == 300
    m = trainer.evaluate(assembled)
    assert all(math.isfinite(v) for v in m.values())
    # B1 fix: label is log-space, so predictions are log-space (~12), not 1e5
    assert 10 < preds.agg(F.avg("prediction")).first()[0] < 14

    path = str(tmp_path / model_type)
    trainer.save(path)
    loaded = ModelTrainer.load(path)
    assert loaded.model_type == model_type
    assert loaded.predict(assembled).count() == 300


def test_trainer_cv_picks_params(assembled):
    trainer = ModelTrainer(model_type="lr").train(assembled, use_cv=True, num_folds=2)
    assert "regParam" in trainer.best_params
    assert trainer.predict(assembled).count() == 300


def test_rf_feature_importances(assembled):
    trainer = ModelTrainer(model_type="rf").train(assembled)
    imps = trainer.feature_importances()
    assert len(imps) == 2
    assert all(v >= 0 for v in imps)
    assert sum(imps) == pytest.approx(1.0, abs=1e-6)


def test_multiclass_classification_beats_random(spark, sf_dir):
    """10-class logistic regression on the synthetic embeddings must
    comfortably beat the 10% random baseline and use every class."""
    from realestate_engine.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["m14_multiclass_classification"](spark, sf_dir).collect()
    n = sum(r.n for r in rows)
    n_correct = sum(r.n_correct for r in rows)
    assert n == 500
    assert len(rows) == 10 and all(r.n_predicted_as > 0 for r in rows)
    assert n_correct / n > 0.2, f"accuracy {n_correct / n}"
