"""Round-13 pins (VERDICT r12 #6): the last thin rows-only entries —
m16 ALS recommendations, the three approximate-similarity variants
(IVF-KMeans, MLlib BRP-LSH, PCA top-k), and m12's importances — get
the m9/m13 discriminating-value treatment: exact seeded outputs pinned
at sf0.001 on an integer milli/micro grid with ±1-grid-unit slack on
floored-double columns (the ADVICE r12 posture — a different BLAS/JDK
may flip one grid unit but must not break the suite intermittently).

Partitioning stability: all five outputs verified tuple-identical
under local[4]/sp=4 and local[8]/sp=8 before pinning (round-13 close).
Identity columns (item, vec_id, rank order) are pinned EXACTLY — the
narrowest adjacent value gap in any of these outputs is ~7 micro-grid
units (sim_brp rows 347/402), four orders of magnitude above the ~1e-3
micro-unit cross-environment drift bound, so ordering cannot flip."""

from __future__ import annotations

import math

from realestate_engine.registry import QUERIES, load_all

load_all()


def _pin_with_grid_slack(rows, expected, exact_cols, grid_cols):
    assert len(rows) == len(expected), (len(rows), len(expected))
    for got, want in zip(rows, expected):
        for i in exact_cols:
            assert got[i] == want[i], (got, want)
        for i in grid_cols:
            assert abs(got[i] - want[i]) <= 1, (got, want)


# (user, rec_rank, item, score_milli) — ALS rank=16, maxIter=5,
# regParam=0.1, seed=SEED over the customer-part quantity matrix.
# Narrowest within-user adjacent score gap is 179 milli (user 15,
# ranks 1-2), so item/rank identity is drift-robust.
M16_EXPECTED = [
    (0, 1, 136, 64803), (0, 2, 174, 64240), (0, 3, 196, 63946),
    (1, 1, 166, 90931), (1, 2, 101, 76595), (1, 3, 133, 71123),
    (2, 1, 93, 75648), (2, 2, 13, 73719), (2, 3, 51, 69740),
    (3, 1, 157, 104818), (3, 2, 166, 97549), (3, 3, 54, 94550),
    (4, 1, 77, 96600), (4, 2, 4, 92129), (4, 3, 123, 85188),
    (5, 1, 131, 104126), (5, 2, 115, 96392), (5, 3, 156, 94009),
    (6, 1, 110, 68265), (6, 2, 26, 58838), (6, 3, 78, 56172),
    (7, 1, 36, 66883), (7, 2, 13, 63145), (7, 3, 177, 62098),
    (8, 1, 79, 85309), (8, 2, 34, 73074), (8, 3, 26, 69068),
    (9, 1, 95, 107656), (9, 2, 172, 87148), (9, 3, 87, 86296),
    (10, 1, 145, 91103), (10, 2, 114, 87979), (10, 3, 48, 85549),
    (11, 1, 88, 70301), (11, 2, 9, 67007), (11, 3, 11, 66425),
    (12, 1, 101, 101990), (12, 2, 157, 71779), (12, 3, 48, 68889),
    (13, 1, 196, 74400), (13, 2, 158, 71837), (13, 3, 157, 70097),
    (14, 1, 57, 80269), (14, 2, 54, 67904), (14, 3, 13, 66609),
    (15, 1, 172, 73211), (15, 2, 165, 72876), (15, 3, 151, 59646),
    (16, 1, 58, 102256), (16, 2, 155, 86734), (16, 3, 4, 76946),
    (17, 1, 157, 92581), (17, 2, 181, 81880), (17, 3, 196, 71256),
    (18, 1, 115, 108273), (18, 2, 192, 103565), (18, 3, 196, 90613),
    (19, 1, 34, 86827), (19, 2, 171, 76278), (19, 3, 106, 76099),
]


def test_m16_als_recommendations_pinned(spark, sf_dir):
    rows = [
        (r.user, r.rec_rank, r.item, math.floor(r.score * 1000))
        for r in QUERIES["m16_als_recommend"](spark, sf_dir).collect()
    ]
    _pin_with_grid_slack(rows, M16_EXPECTED, (0, 1, 2), (3,))


# (vec_id, cosine_micro) — seeded KMeans(8) quantizer, nprobe=2,
# probe vec_id=0. Narrowest adjacent gap 8 micro (rows 347/402).
SIM_IVF_KMEANS_EXPECTED = [
    (0, 1000000), (17, 334456), (225, 315127), (260, 298669),
    (73, 297238), (212, 281399), (347, 274508), (402, 274500),
    (299, 268713), (497, 252081), (82, 249400), (59, 248708),
    (71, 245227), (248, 239341), (493, 229303), (346, 223429),
    (244, 214549), (3, 205923), (257, 205861), (19, 204448),
]


def test_sim_ivf_kmeans_topk_pinned(spark, sf_dir):
    rows = [
        (r.vec_id, math.floor(r.cosine * 1e6))
        for r in QUERIES["sim_ivf_kmeans_topk"](spark, sf_dir).collect()
    ]
    _pin_with_grid_slack(rows, SIM_IVF_KMEANS_EXPECTED, (0,), (1,))


# (vec_id, dist_micro) — BucketedRandomProjectionLSH(bucketLength=2.0,
# numHashTables=4, seed=42), approxNearestNeighbors k=20.
SIM_BRP_EXPECTED = [
    (0, 0), (17, 1153728), (225, 1170361), (12, 1173859),
    (483, 1182835), (260, 1184340), (73, 1185548), (212, 1198833),
    (347, 1204568), (402, 1204575), (299, 1209369), (232, 1210505),
    (82, 1225235), (59, 1225799), (394, 1225834), (71, 1228636),
    (248, 1233417), (262, 1233900), (453, 1235509), (493, 1241529),
]


def test_sim_brp_lsh_ann_mllib_pinned(spark, sf_dir):
    rows = [
        (r.vec_id, math.floor(r.euclidean_dist * 1e6))
        for r in QUERIES["sim_brp_lsh_ann_mllib"](spark, sf_dir).collect()
    ]
    _pin_with_grid_slack(rows, SIM_BRP_EXPECTED, (0,), (1,))


# (vec_id, dist_micro) — center-only StandardScaler → PCA k=32 →
# exact euclidean top-20 in the reduced space.
SIM_PCA_EXPECTED = [
    (0, 0), (340, 835119), (17, 870202), (212, 897522),
    (350, 900739), (225, 901618), (73, 904682), (71, 913866),
    (402, 915581), (282, 916911), (67, 928495), (248, 933228),
    (3, 939701), (299, 941193), (483, 941211), (257, 964738),
    (463, 970473), (453, 982490), (244, 983352), (15, 985446),
]


def test_sim_pca_topk_pinned(spark, sf_dir):
    rows = [
        (r.vec_id, math.floor(r.euclidean_dist * 1e6))
        for r in QUERIES["sim_pca_topk"](spark, sf_dir).collect()
    ]
    _pin_with_grid_slack(rows, SIM_PCA_EXPECTED, (0,), (1,))


# (feature, importance_micro) — RandomForestRegressor(numTrees=10,
# maxDepth=4, seed=SEED) Gini-style importance split, already ordered
# descending by the query. The three values sum to ~1e6 (round-to-6
# of a simplex point).
M12_EXPECTED = [
    ("f_cust", 464455), ("f_dom", 322111), ("f_month", 213434),
]


def test_m12_feature_importances_pinned(spark, sf_dir):
    rows = [
        (r.feature, math.floor(r.importance * 1e6))
        for r in QUERIES["m12_feature_importances"](spark, sf_dir).collect()
    ]
    _pin_with_grid_slack(rows, M12_EXPECTED, (0,), (1,))
    assert abs(sum(v for _, v in rows) - 1_000_000) <= 3  # simplex
