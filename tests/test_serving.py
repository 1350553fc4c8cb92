"""The webapp-analogue serving surface (serving.py): artifact load →
single + batch prediction over a stdlib HTTP JSON API, asserted
against the direct batch path so the served numbers cannot drift."""

from __future__ import annotations

import json
import random
import threading
import urllib.request

import pytest

from pyspark.sql import functions as F

from realestate_engine.features import FeatureEngineering
from realestate_engine.predict import predict_batch
from realestate_engine.schemas import LISTINGS_SCHEMA
from realestate_engine.serving import PredictionService, serve
from realestate_engine.target import TargetTransformer
from realestate_engine.train import ModelTrainer

_TYPES = ["apartment", "house", "villa", "land"]
_CATS = ["A", "B", "C", "D"]
_EXPO = ["north", "south", "east", "west"]


def _listing(i: int, rng: random.Random) -> tuple:
    rec = {
        "id_annonce": i,
        "property_type": _TYPES[i % 4],
        "approximate_latitude": 48.0 + rng.random(),
        "approximate_longitude": 2.0 + rng.random(),
        "city": f"city{i % 10}",
        "postal_code": 75000 + i % 100,
        "size": 20.0 + 200.0 * rng.random(),
        "floor": i % 6,
        "land_size": 500.0 * rng.random() if i % 4 in (1, 2) else None,
        "energy_performance_value": 50.0 + 300.0 * rng.random(),
        "energy_performance_category": _CATS[i % 4],
        "ghg_value": 5.0 + 50.0 * rng.random(),
        "ghg_category": _CATS[(i + 1) % 4],
        "exposition": _EXPO[i % 4],
        "nb_rooms": 1 + i % 7,
        "nb_bedrooms": i % 4,
        "nb_bathrooms": i % 3,
        "nb_parking_places": i % 2,
        "nb_boxes": i % 2,
        "nb_photos": i % 12,
        "has_a_balcony": float(i % 2),
        "nb_terraces": float(i % 3),
        "has_a_cellar": float(i % 2),
        "has_a_garage": float((i + 1) % 2),
        "has_air_conditioning": float(i % 5 == 0),
        "last_floor": float(i % 6 == 5),
        "upper_floors": float(i % 6),
    }
    return tuple(rec.get(f.name) for f in LISTINGS_SCHEMA.fields)


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    rng = random.Random(11)
    x = spark.createDataFrame([_listing(i, rng) for i in range(300)], LISTINGS_SCHEMA)
    y = x.select(
        "id_annonce",
        (F.col("size") * 3000.0 + F.col("nb_rooms") * 20000.0 + 50000.0).alias("price"),
    )
    joined = x.join(y, "id_annonce")
    fe = FeatureEngineering(strict_mode=True)
    feats = fe.fit_transform(joined)
    tt = TargetTransformer().fit(feats)
    trainer = ModelTrainer(model_type="rf", label_col="log_price").train(tt.transform(feats))
    root = tmp_path_factory.mktemp("artifacts")
    fe.save(str(root / "fe"))
    tt.save(str(root / "tt.json"))
    trainer.save(str(root / "model"))
    return PredictionService.load(spark, str(root)), x


def test_single_matches_batch_path(service):
    svc, x = service
    rec = x.filter(F.col("id_annonce") == 3).first().asDict()
    got = svc.single(rec)
    direct = predict_batch(
        x.filter(F.col("id_annonce") == 3), svc.fe, svc.trainer, svc.tt
    ).first()
    assert got["id_annonce"] == 3
    assert got["predicted_price"] == pytest.approx(round(direct["predicted_price"], 2))


def test_batch_audit_single_pass(service):
    svc, x = service
    audit = svc.batch_audit(x)
    assert audit["n_rows"] == 300
    # land_size is null for half the generator's rows; non-null cols absent
    assert audit["null_counts"].get("land_size", 0) == 150
    assert "size" not in audit["null_counts"]


def test_http_api_end_to_end(service, tmp_path):
    svc, x = service
    server = serve(svc, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            assert json.load(r) == {"status": "ok"}

        rng = random.Random(11)
        rec = {f.name: v for f, v in zip(LISTINGS_SCHEMA.fields, _listing(0, rng))}
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps(rec).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            single = json.load(r)
        assert single["id_annonce"] == 0 and single["predicted_price"] > 0

        # batch: round-trip 20 listings through CSV text
        sub = x.filter(F.col("id_annonce") < 20)
        csv_dir = tmp_path / "csv"
        sub.coalesce(1).write.option("header", "true").mode("overwrite").csv(str(csv_dir))
        csv_text = next(csv_dir.glob("part-*.csv")).read_text()
        req = urllib.request.Request(f"{base}/predict_batch", data=csv_text.encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            batch = json.load(r)
        assert batch["audit"]["n_rows"] == 20
        assert len(batch["predictions"]) == 20
        assert {p["id_annonce"] for p in batch["predictions"]} == set(range(20))
        assert all(p["predicted_price"] > 0 for p in batch["predictions"])

        # malformed request → HTTP 400, server stays alive
        bad = urllib.request.Request(f"{base}/predict", data=b"not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()
