"""Round-12 pins: the m9/m13 rows-only outputs were upgraded from
1-row sentinels to per-order-month breakdowns (VERDICT r11 #3) so the
driver's rows-entry binds the seeded model's behavior. These tests pin
the exact seeded values at sf0.001 — the per-row milli/cent grid is an
order-free integer reduction (FLOOR then BIGINT sum / integer DIV), so
the values are partitioning-stable (verified identical under
local[4]/sp=4 and local[8]/sp=8)."""

from __future__ import annotations

from realestate_engine.registry import QUERIES, load_all

load_all()

# (order_month, n_predictions, n_bad, mean_pred_milli, min_pred_milli,
#  max_pred_milli) — RandomForestRegressor(numTrees=10, maxDepth=4,
# seed=SEED) on log_price, sf0.001.
M9_EXPECTED = [
    (1, 132, 0, 12108, 11852, 12274),
    (2, 125, 0, 12127, 11901, 12249),
    (3, 123, 0, 12127, 11820, 12249),
    (4, 128, 0, 12152, 11922, 12291),
    (5, 137, 0, 12150, 11906, 12262),
    (6, 136, 0, 12116, 11857, 12220),
    (7, 146, 0, 12136, 11896, 12263),
    (8, 117, 0, 12097, 11571, 12325),
    (9, 114, 0, 12121, 11772, 12255),
    (10, 110, 0, 12049, 11593, 12216),
    (11, 125, 0, 12146, 11637, 12308),
    (12, 107, 0, 12093, 11638, 12433),
]

# (order_month, n_predictions, n_invalid, mean_pred_cents,
#  min_pred_cents, max_pred_cents) — LinearRegression on log_price +
# smearing inverse, sf0.001.
M13_EXPECTED = [
    (1, 132, 0, 30184590, 29897373, 30478457),
    (2, 125, 0, 30050823, 29796280, 30346381),
    (3, 123, 0, 29990718, 29694530, 30291928),
    (4, 128, 0, 29859354, 29620091, 30159818),
    (5, 137, 0, 29791492, 29532716, 30104343),
    (6, 136, 0, 29703214, 29438815, 30014530),
    (7, 146, 0, 29657013, 29398880, 29883800),
    (8, 117, 0, 29565118, 29286794, 29845270),
    (9, 114, 0, 29444892, 29188915, 29717446),
    (10, 110, 0, 29395775, 29110828, 29635952),
    (11, 125, 0, 29284162, 29022837, 29563649),
    (12, 107, 0, 29192804, 28914625, 29454579),
]


def _assert_pinned_with_grid_slack(rows, expected, exact_cols, grid_cols):
    """Exact match on count columns; ±1 grid unit on floored-double
    columns (ADVICE r12): FLOOR(pred*10^k) of an MLlib double sits on
    an environment-dependent grid — a different BLAS/JDK can flip a
    value one grid unit, which must not break the suite intermittently.
    The ±1 slack still binds the model's behavior to the milli/cent."""
    assert len(rows) == len(expected)
    for got, want in zip(rows, expected):
        for i in exact_cols:
            assert got[i] == want[i], (got, want)
        for i in grid_cols:
            assert abs(got[i] - want[i]) <= 1, (got, want)


def test_m9_per_month_breakdown_pinned(spark, sf_dir):
    rows = [tuple(r) for r in QUERIES["m9_rf_train_predict"](spark, sf_dir).collect()]
    _assert_pinned_with_grid_slack(rows, M9_EXPECTED, (0, 1, 2), (3, 4, 5))


def test_m13_per_month_breakdown_pinned(spark, sf_dir):
    rows = [tuple(r) for r in QUERIES["m13_batch_predict"](spark, sf_dir).collect()]
    _assert_pinned_with_grid_slack(rows, M13_EXPECTED, (0, 1, 2), (3, 4, 5))


def test_grid_margins_and_aft_clamp_clearance(sf_dir):
    """ADVICE r11: the m17/m21/m24 floor-grid oracles are certified
    only while every published estimate sits clear of its nearest grid
    line AND the m24 Newton's rho converges strictly above its 0.05
    domain clamp (an active clamp would publish a constrained point
    that is not the MLE). DuckDB-only — no Spark session needed."""
    import sys

    sys.path.insert(0, ".")
    from tools.grid_margin import MARGIN_MIN, RHO_FLOOR, _con, m17_margins, m21_margins, m24_margins

    con = _con(sf_dir)
    margins = m17_margins(con) + m21_margins(con)
    aft, rho = m24_margins(con)
    margins += aft
    assert rho > RHO_FLOOR + 1e-6, f"AFT rho {rho} sits on the 0.05 clamp"
    bad = [(n, m) for n, m in margins if m < MARGIN_MIN[n[:3]]]
    assert not bad, f"estimates within their family floor of a grid line: {bad}"


# m14/m20 extend the same discriminating-rows pattern (round 12):
# per-class softmax counts and per-activity-bucket ALS recall, exact
# integer tuples verified identical under local[4]/sp=4 and
# local[8]/sp=8 at sf0.001.
M14_EXPECTED = [
    (0, 56, 28, 59), (1, 47, 14, 38), (2, 54, 19, 49), (3, 43, 22, 46),
    (4, 48, 16, 45), (5, 51, 22, 54), (6, 42, 19, 46), (7, 50, 18, 52),
    (8, 46, 19, 42), (9, 63, 28, 69),
]

M20_EXPECTED = [(5, 1, 0), (7, 1, 0), (8, 148, 10)]


def test_m14_per_class_breakdown_pinned(spark, sf_dir):
    rows = [tuple(r) for r in QUERIES["m14_multiclass_classification"](spark, sf_dir).collect()]
    assert rows == M14_EXPECTED
    # accounting invariants: supports and predicted-as both sum to n
    assert sum(r[1] for r in rows) == sum(r[3] for r in rows) == 500
    assert all(r[2] <= min(r[1], r[3]) for r in rows)


def test_m14_argmax_margin_certification(spark, sf_dir):
    """ADVICE r12 companion to the m14 pin: the per-class counts are
    exact integers only while every softmax argmax is decided by a
    margin far above cross-environment drift. Certify the minimum
    top1-top2 rawPrediction gap over the corpus: logit drift under a
    different BLAS/JDK is bounded ~1e-9, so a 1e-6 floor gives the
    same 10x-over-bound safety factor tools/grid_margin.py uses. If
    this ever fails, the M14_EXPECTED pin must gain tie tolerance."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    from realestate_engine.registry import t as load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding")).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    model = LogisticRegression(maxIter=25, regParam=0.01, tol=1e-6).fit(e)
    gaps = (
        model.transform(e)
        .select(F.sort_array(vector_to_array("rawPrediction"), asc=False).alias("s"))
        .select((F.col("s")[0] - F.col("s")[1]).alias("gap"))
        .agg(F.min("gap").alias("min_gap"))
        .collect()[0]
    )
    assert gaps.min_gap > 1e-6, f"argmax margin {gaps.min_gap} too thin for an exact pin"


def test_m20_per_bucket_recall_pinned(spark, sf_dir):
    rows = [tuple(r) for r in QUERIES["m20_als_recall_eval"](spark, sf_dir).collect()]
    assert rows == M20_EXPECTED
    assert all(hits <= users for _, users, hits in rows)


# m10's CV output now binds the whole grid landscape: one row per
# ParamMap with FLOOR-milli CV-mean rmse and the winner flag. Values
# verified identical under local[4]/sp=4 and local[8]/sp=8.
M10_EXPECTED = [
    (0.1, 0.0, 980, False, 1500),
    (0.1, 1.0, 978, True, 1500),
    (1.0, 0.0, 979, False, 1500),
    (1.0, 1.0, 978, False, 1500),
]


def test_m10_cv_grid_landscape_pinned(spark, sf_dir):
    rows = [tuple(r) for r in QUERIES["m10_cross_validator"](spark, sf_dir).collect()]
    # params and n_train exact; cv_rmse_milli ±1 grid unit (ADVICE r12)
    _assert_pinned_with_grid_slack(rows, M10_EXPECTED, (0, 1, 4), (2,))
    assert sum(r[3] for r in rows) == 1  # exactly one winner
    # tie-robust winner check: two grid points share the 978-milli
    # minimum, so the exact winner identity is decided by sub-milli
    # doubles that a different BLAS/JDK could reorder. Bind instead
    # that the flagged winner sits on the landscape minimum (±1).
    winner = next(r for r in rows if r[3])
    assert winner[2] <= min(r[2] for r in rows) + 1


def test_no_tz_dependent_oracle_constructs():
    """Round-12 find: DuckDB's TO_TIMESTAMP returns TIMESTAMPTZ, and
    CAST(ttz AS TIMESTAMP) localizes through the HOST timezone — so an
    oracle using it shifts by the UTC offset on any non-UTC host (x19
    and the three windowed-streaming oracles failed under
    TZ=America/New_York before the MAKE_TIMESTAMP/INTERVAL rewrite;
    the full registry now sweeps clean under that TZ). Pin the whole
    registry free of host-TZ-dependent constructs."""
    import re

    from realestate_engine.registry import ORACLES, load_all

    load_all()
    banned = re.compile(
        r"TO_TIMESTAMP|TIMESTAMPTZ|AT TIME ZONE|NOW\(\)|CURRENT_DATE|CURRENT_TIMESTAMP",
        re.IGNORECASE,
    )
    offenders = {n for n, sql in ORACLES.items() if banned.search(sql)}
    assert not offenders, f"host-TZ-dependent oracle constructs in: {sorted(offenders)}"
