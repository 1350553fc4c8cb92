"""Command-line entry points mirroring the reference's user surface
(SURVEY.md §3 EP1-EP3: notebooks/00_prepare_data.py ETL,
src/models/train.py __main__ training, src/inference/predict.py batch
inference) — so a user of the reference can run the same three commands
against this engine.

    python -m realestate_engine.cli prepare --x X.csv --y y.csv --out data.parquet
    python -m realestate_engine.cli train   --data data.parquet --model-dir out/ [--model rf|lr|gbt] [--cv]
    python -m realestate_engine.cli predict --data X.csv --model-dir out/ --out preds.csv
    python -m realestate_engine.cli serve   --model-dir out/ --port 8000   # webapp surface (EP5)

Differences from the reference, by design:
- explicit schema on CSV scans (inference is an extra full pass);
- ONE multi-column approxQuantile during feature fit (not 11 jobs);
- training label is log_price (reference bug B1 trained on raw price
  yet inverted at serving, shipping inf predictions);
- predictions leave via the native distributed CSV sink (the reference
  detoured through toPandas on the driver).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from realestate_engine.features import FeatureEngineering
from realestate_engine.io import read_csv, write_csv, write_parquet
from realestate_engine.predict import predict_batch
from realestate_engine.schemas import LISTINGS_SCHEMA, PRICES_SCHEMA
from realestate_engine.session import create_session
from realestate_engine.target import TargetTransformer
from realestate_engine.train import ModelTrainer


def cmd_prepare(args: argparse.Namespace) -> None:
    """EP1: X.csv ⋈ y.csv on id_annonce → typed parquet + join audit."""
    spark = create_session("realestate_prepare")
    x = read_csv(spark, args.x, schema=LISTINGS_SCHEMA)
    y = read_csv(spark, args.y, schema=PRICES_SCHEMA)
    joined = x.join(y, "id_annonce")
    orphans = x.join(y, "id_annonce", "left_anti").count()
    write_parquet(joined, args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows_written": n, "x_rows_without_price": orphans, "out": args.out}))


def cmd_train(args: argparse.Namespace) -> None:
    """EP2: feature fit → log-target transform → train → evaluate →
    persist all three artifacts under --model-dir."""
    spark = create_session("realestate_train")
    df = spark.read.parquet(args.data)
    train_df, val_df = df.randomSplit([0.8, 0.2], seed=42)

    fe = FeatureEngineering(strict_mode=True)
    feats = fe.fit_transform(train_df)
    tt = TargetTransformer().fit(feats)
    labeled = tt.transform(feats)
    trainer = ModelTrainer(model_type=args.model, label_col="log_price").train(
        labeled, use_cv=args.cv
    )

    val_feats = tt.transform(fe.transform(val_df))
    metrics = trainer.evaluate(val_feats)

    os.makedirs(args.model_dir, exist_ok=True)
    fe.save(os.path.join(args.model_dir, "fe"))
    tt.save(os.path.join(args.model_dir, "tt.json"))
    trainer.save(os.path.join(args.model_dir, "model"))
    print(json.dumps({"model": args.model, "metrics": metrics, "best_params": trainer.best_params}))


def cmd_compare(args: argparse.Namespace) -> None:
    """EP2b: the reference's 3-model comparison in one command
    (notebooks/03_model_training.py:93-110,199-227 — train rf/lr/gbt
    on the same split, evaluate each on validation, write
    model_comparison.csv with metrics as rows and models as columns,
    then persist the best-by-RMSE model's artifacts). One feature/target
    fit is shared across the three trains (the transforms are
    model-independent), so the corpus is scanned for features once."""
    spark = create_session("realestate_compare")
    df = spark.read.parquet(args.data)
    train_df, val_df = df.randomSplit([0.8, 0.2], seed=42)

    fe = FeatureEngineering(strict_mode=True)
    feats = fe.fit_transform(train_df)
    tt = TargetTransformer().fit(feats)
    labeled = tt.transform(feats).cache()
    val_feats = tt.transform(fe.transform(val_df)).cache()

    model_types = ["rf", "lr", "gbt"]
    results: dict[str, dict[str, float]] = {}
    trainers: dict[str, ModelTrainer] = {}
    for mt in model_types:
        trainer = ModelTrainer(model_type=mt, label_col="log_price").train(
            labeled, use_cv=args.cv
        )
        trainers[mt] = trainer
        results[mt] = trainer.evaluate(val_feats)

    metric_names = ["rmse", "r2", "mae"]
    os.makedirs(args.model_dir, exist_ok=True)
    csv_path = os.path.join(args.model_dir, "model_comparison.csv")
    with open(csv_path, "w") as f:
        # reference layout (models/model_comparison.csv): blank index
        # header, model columns, one row per metric; values rounded to
        # 4 decimals then printed shortest-repr (pandas
        # DataFrame.round(4).to_csv writes "0.5", not "0.5000")
        f.write("," + ",".join(model_types) + "\n")
        for m in metric_names:
            f.write(m + "," + ",".join(f"{round(results[mt][m], 4)}" for mt in model_types) + "\n")

    best = min(model_types, key=lambda mt: results[mt]["rmse"])
    fe.save(os.path.join(args.model_dir, "fe"))
    tt.save(os.path.join(args.model_dir, "tt.json"))
    trainers[best].save(os.path.join(args.model_dir, "model"))
    print(
        json.dumps(
            {
                "best_model": best,
                "best_params": trainers[best].best_params,
                "results": {mt: {m: results[mt][m] for m in metric_names} for mt in model_types},
                "comparison_csv": csv_path,
                "model_dir": args.model_dir,
            }
        )
    )


def cmd_predict(args: argparse.Namespace) -> None:
    """EP3: reload artifacts → batch predict → distributed CSV sink."""
    spark = create_session("realestate_predict")
    fe = FeatureEngineering.load(os.path.join(args.model_dir, "fe"))
    fe.strict_mode = False  # inference tolerates unseen categories
    tt = TargetTransformer.load(os.path.join(args.model_dir, "tt.json"))
    trainer = ModelTrainer.load(os.path.join(args.model_dir, "model"))

    x = read_csv(spark, args.data, schema=LISTINGS_SCHEMA)
    preds = predict_batch(x, fe, trainer, tt)
    write_csv(preds, args.out)
    audit = preds.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.isnan("predicted_price") | F.col("predicted_price").isNull(), 1).otherwise(0)).alias(
            "n_invalid"
        ),
    ).first()
    print(json.dumps({"predictions": audit.n, "invalid": int(audit.n_invalid or 0), "out": args.out}))


def cmd_serve(args: argparse.Namespace) -> None:
    """EP5: the reference webapp's surface (src/webapp/app.py) as a
    dependency-free HTTP JSON API — GET /health, POST /predict (one
    listing as JSON), POST /predict_batch (CSV text body). Artifacts
    load once per process, like the webapp's cached init_resources."""
    from realestate_engine.serving import PredictionService, serve

    spark = create_session("realestate_serve")
    svc = PredictionService.load(spark, args.model_dir)
    server = serve(svc, host=args.host, port=args.port)
    print(json.dumps({"serving": f"http://{args.host}:{server.server_address[1]}"}), flush=True)
    server.serve_forever()


def cmd_corpus(args: argparse.Namespace) -> None:
    """EP4 (engine extension): LLM-corpus cleaning over a testdata-layout
    directory — near-dup clustering → canonical selection → write the
    kept documents as parquet, print the funnel stats."""
    from realestate_engine.registry import QUERIES, load_all, t

    load_all()
    spark = create_session("realestate_corpus")
    # verdicts exist only for the clustered (short-doc) universe; docs
    # outside it have no near-dup candidates and pass through untouched
    verdicts = QUERIES["dedup_canonical_selection"](spark, args.sf_dir).select(
        "doc_id", "keep"
    )
    docs = t(spark, args.sf_dir, "documents")
    kept_docs = (
        docs.join(verdicts, "doc_id", "left")
        .filter(F.coalesce(F.col("keep"), F.lit(True)))
        .drop("keep")
    )
    write_parquet(kept_docs, args.out)
    n_in, n_out = docs.count(), spark.read.parquet(args.out).count()
    n_dropped = n_in - n_out
    print(json.dumps({"docs_in": n_in, "docs_kept": n_out, "near_dups_dropped": n_dropped, "out": args.out}))


def cmd_eda(args: argparse.Namespace) -> None:
    """EP6: the reference notebook's EDA figure set as distributed
    aggregates rendered to dependency-free SVG (plotting.eda_report)."""
    from realestate_engine.io import read_parquet
    from realestate_engine.plotting import eda_report

    spark = create_session("realestate_eda")
    df = read_parquet(spark, args.data)
    paths = eda_report(df, args.out)
    print(json.dumps({"figures": len(paths), "out": args.out}))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="realestate_engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prepare", help="EP1: join X/y CSVs into typed parquet")
    p.add_argument("--x", required=True)
    p.add_argument("--y", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("train", help="EP2: fit features+target, train, persist")
    p.add_argument("--data", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--model", default="rf", choices=["rf", "lr", "gbt"])
    p.add_argument("--cv", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "compare",
        help="EP2b: train rf/lr/gbt side-by-side, write model_comparison.csv, keep the best",
    )
    p.add_argument("--data", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--cv", action="store_true")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("predict", help="EP3: batch inference to CSV")
    p.add_argument("--data", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("corpus", help="EP4: dedup + canonical-select a document corpus")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_corpus)

    p = sub.add_parser(
        "serve", help="EP5: HTTP JSON prediction API (the webapp surface)"
    )
    p.add_argument("--model-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("eda", help="EP6: distributed EDA figures to SVG (notebook 01 parity)")
    p.add_argument("--data", required=True, help="prepared listings parquet (with price)")
    p.add_argument("--out", required=True, help="output directory for .svg figures")
    p.set_defaults(fn=cmd_eda)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
