"""Interactive prediction surface — the engine-side analogue of the
reference's Streamlit webapp (src/webapp/app.py:1-308), re-expressed
as a dependency-free service layer + stdlib HTTP JSON API.

The reference ships a Streamlit UI with two modes: single prediction
(form → dict → price) and batch prediction (CSV upload → a
per-column null audit + (id_annonce, prediction_price) CSV). This
module provides the same two operations behind:

- ``PredictionService`` — artifact loading + request handling, usable
  from any UI or notebook;
- ``serve()`` — a zero-dependency ``http.server`` JSON API
  (GET /health, POST /predict, POST /predict_batch) for the
  container-without-streamlit case. One request = one Spark job; the
  SparkSession, fitted features, target stats and model are loaded
  once per process, exactly like the reference's ``@st.cache_resource``
  ``init_resources`` (app.py:28-45).

Fidelity notes vs the reference webapp:
- the batch-mode data-quality report (app.py:74-101) ran ONE count()
  job per column in a Python loop; ``batch_audit`` computes the same
  numbers in a single aggregate pass (the 100 TB shape);
- predictions come back smearing-corrected in price space via the
  same inverse-transform path as the CLI/batch entry points — there
  is no webapp-only code path to drift.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.features import FeatureEngineering
from realestate_engine.predict import predict_batch, predict_single
from realestate_engine.target import TargetTransformer
from realestate_engine.train import ModelTrainer


class PredictionService:
    """Loaded-once inference resources + the two webapp operations.

    ``artifact_dir`` layout is the one ``cli.py train`` writes:
    ``fe/`` (feature pipeline + params), ``tt.json`` (target stats),
    ``model/`` (Spark ML model). Features load in PERMISSIVE mode so
    unseen categories at serve time map to the keep bucket instead of
    failing the request (reference app.py loads the same way via
    ModelTrainer.load_model)."""

    def __init__(
        self,
        spark: SparkSession,
        fe: FeatureEngineering,
        trainer: ModelTrainer,
        tt: TargetTransformer,
    ):
        self.spark = spark
        self.fe = fe
        self.trainer = trainer
        self.tt = tt

    @classmethod
    def load(cls, spark: SparkSession, artifact_dir: str) -> "PredictionService":
        fe = FeatureEngineering.load(os.path.join(artifact_dir, "fe"))
        fe.strict_mode = False  # permissive at serve time
        tt = TargetTransformer.load(os.path.join(artifact_dir, "tt.json"))
        trainer = ModelTrainer.load(os.path.join(artifact_dir, "model"))
        return cls(spark, fe, trainer, tt)

    # -- single prediction (app.py predict_single, :52-66) --------------

    def single(self, record: dict[str, Any]) -> dict[str, Any]:
        row = predict_single(self.spark, record, self.fe, self.trainer, self.tt).first()
        return {
            "id_annonce": row["id_annonce"],
            "predicted_price": round(float(row["predicted_price"]), 2),
        }

    # -- batch prediction + audit (app.py predict_batch, :68-112) -------

    def batch_df(self, listings: DataFrame) -> DataFrame:
        return predict_batch(listings, self.fe, self.trainer, self.tt)

    def batch_audit(self, listings: DataFrame) -> dict[str, Any]:
        """The webapp's data-quality report as ONE aggregate job:
        row count + per-column null counts (the reference looped a
        count() job per column, app.py:89-92)."""
        aggs = [F.count(F.lit(1)).alias("_rows")] + [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(c)
            for c in listings.columns
        ]
        row = listings.agg(*aggs).first().asDict()
        n = row.pop("_rows")
        return {"n_rows": n, "null_counts": {c: v for c, v in row.items() if v}}

    def batch_csv(self, csv_path: str) -> tuple[list[dict[str, Any]], dict[str, Any]]:
        """CSV in → (predictions, audit), the full upload flow."""
        from realestate_engine.schemas import LISTINGS_SCHEMA

        listings = self.spark.read.schema(LISTINGS_SCHEMA).option("header", "true").csv(csv_path)
        audit = self.batch_audit(listings)
        preds = [
            {"id_annonce": r["id_annonce"], "predicted_price": round(float(r["predicted_price"]), 2)}
            for r in self.batch_df(listings).collect()
        ]
        return preds, audit


def serve(service: PredictionService, host: str = "127.0.0.1", port: int = 0):
    """Zero-dependency HTTP JSON API over a PredictionService.

    Routes:
    - ``GET  /health``         → {"status": "ok"}
    - ``POST /predict``        → body: one listing as a JSON object
    - ``POST /predict_batch``  → body: CSV text (same columns as
      X_test.csv, header row required) → {"predictions": [...],
      "audit": {...}}

    Returns the (not yet started) ``ThreadingHTTPServer``; call
    ``serve_forever()`` (or run it in a thread, as the tests do). Port
    0 binds an ephemeral port — read it from ``server.server_address``.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet test logs
            pass

        def do_GET(self) -> None:
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self) -> None:
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                if self.path == "/predict":
                    self._send(200, service.single(json.loads(raw)))
                elif self.path == "/predict_batch":
                    with tempfile.NamedTemporaryFile(
                        suffix=".csv", delete=False, mode="wb"
                    ) as f:
                        f.write(raw)
                        tmp = f.name
                    try:
                        preds, audit = service.batch_csv(tmp)
                    finally:
                        os.unlink(tmp)
                    self._send(200, {"predictions": preds, "audit": audit})
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as e:  # noqa: BLE001 - surface as HTTP 400, don't kill the server
                self._send(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)
