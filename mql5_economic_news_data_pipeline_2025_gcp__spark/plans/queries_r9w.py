"""Round-9 batch w: density-based outlier scoring and intrinsic
dimensionality.

``evt_lof_reachability`` — the Local Outlier Factor's exact
reachability table over the daily (purchase, view) point cloud: for
each day, its k = 5 nearest neighbors (squared integer L2, ties by
neighbor day), the k-distance, and each neighbor's reachability
distance max(d(a,b), kdist(b)).  LOF itself is a ratio of local
reachability densities — the gate assembles it from the emitted edge
table and pins the classic invariants (LOF ≈ 1 in uniform regions,
reach ≥ kdist(b) ≥ 0).  The DENSITY-relative outlier view next to
`evt_anomaly_zscore` (global) and `evt_outlier_iqr` (marginal):
a point can be globally ordinary but locally anomalous.

``emb_twonn_intrinsic_dim`` — Facco's TwoNN intrinsic-dimension
estimator over the bounded anchor frame: each anchor's first and
second nearest-neighbor squared distances; the gate assembles
d̂ = n / Σ ln(r₂/r₁) (with r = √d², so the ratio halves the log) and
pins d̂ > 0 and the d₂ ≥ d₁ ordering.  Tells an ANN/index planner the
EFFECTIVE dimensionality the data actually occupies — the number that
decides PQ codebook sizes and HNSW ef budgets, next to
`emb_anisotropy_spectrum`'s linear view.

Determinism: all distances are exact integer (milli²/cent²) L2; rank
selection uses (distance, neighbor id) tie-breakers; the gates own
every division and logarithm.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

_PAIR = ("purchase", "view")
_LOF_K = 5
_NN_ANCHORS = 128


@register(
    "evt_lof_reachability",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = '{_PAIR[0]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = '{_PAIR[1]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    p AS (
      SELECT a.day AS da, b.day AS db,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM d a JOIN d b ON a.day <> b.day),
    r AS (
      SELECT da, db, d2,
             row_number() OVER (PARTITION BY da ORDER BY d2, db) AS rk
      FROM p),
    knn AS (SELECT da, db, d2 FROM r WHERE rk <= {_LOF_K}),
    kd AS (
      SELECT da, CAST(max(d2) AS BIGINT) AS kdist2
      FROM knn GROUP BY da)
    SELECT k.da AS day, k.db AS neighbor, CAST(k.d2 AS BIGINT) AS d2,
           CAST(greatest(k.d2, kb.kdist2) AS BIGINT) AS reach2,
           CAST(ka.kdist2 AS BIGINT) AS kdist2_self
    FROM knn k
    JOIN kd ka ON ka.da = k.da
    JOIN kd kb ON kb.da = k.db
    """,
    description=(
        f"Local Outlier Factor reachability table (k = {_LOF_K}) over "
        "the daily (purchase, view) point cloud: exact squared-cent "
        "L2 pairs of the ≤366-row day frame, k-NN by (d², neighbor "
        "day) rank, k-distances, and reach²(a→b) = max(d², kdist²(b)) "
        "— the full edge table LOF needs, so the gate assembles local "
        "reachability densities and the LOF ratio and pins "
        "reach ≥ kdist(b), LOF > 0. Density-RELATIVE outliers: "
        "globally ordinary days that sit in locally sparse regions, "
        "invisible to z-score and IQR rules. Shape: one day rollup, "
        "one checkpointed-frame self-join bounded by days², two "
        "broadcast joins of day-sized folds"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_lof_reachability(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == tname, F.col("value_c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias(col)
            for tname, col in zip(_PAIR, ("x", "y"))
        ]
    ).localCheckpoint()  # ≤366 rows; feeds both self-join sides
    a = d.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    p = a.join(F.broadcast(b), F.col("da") != F.col("db")).select(
        "da",
        "db",
        (
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
        ).alias("d2"),
    )
    knn = (
        p.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("da").orderBy("d2", "db")
            ),
        )
        .filter(F.col("rk") <= _LOF_K)
        .drop("rk")
        .localCheckpoint()  # k·days edges; feeds kdist AND the readout
    )
    kd = knn.groupBy("da").agg(F.max("d2").cast("bigint").alias("kdist2"))
    ka = kd.select(F.col("da").alias("ka_da"), F.col("kdist2").alias("kdist2_self"))
    kb = kd.select(F.col("da").alias("kb_da"), F.col("kdist2").alias("kdist2_nb"))
    return (
        knn.join(F.broadcast(ka), knn["da"] == ka["ka_da"])
        .join(F.broadcast(kb), knn["db"] == kb["kb_da"])
        .select(
            F.col("da").alias("day"),
            F.col("db").alias("neighbor"),
            F.col("d2").cast("bigint").alias("d2"),
            F.greatest("d2", "kdist2_nb").cast("bigint").alias("reach2"),
            F.col("kdist2_self").cast("bigint").alias("kdist2_self"),
        )
    )


@register(
    "emb_twonn_intrinsic_dim",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < {_NN_ANCHORS}),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_sum(list_transform(range(1, len(a.qv) + 1),
                      i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
               AS d2
      FROM q a JOIN q b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT ia, ib, d2,
             row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rk
      FROM p)
    SELECT ia AS vec_id,
           CAST(max(CASE WHEN rk = 1 THEN d2 END) AS BIGINT) AS d1_2,
           CAST(max(CASE WHEN rk = 2 THEN d2 END) AS BIGINT) AS d2_2,
           CAST(max(CASE WHEN rk = 1 THEN ib END) AS BIGINT) AS nn1,
           CAST(max(CASE WHEN rk = 2 THEN ib END) AS BIGINT) AS nn2
    FROM r WHERE rk <= 2 GROUP BY ia
    """,
    description=(
        "TwoNN intrinsic-dimension sufficient statistics over the "
        f"bounded anchor frame (vec_id < {_NN_ANCHORS}): each "
        "anchor's first and second nearest-neighbor SQUARED integer "
        "distances and neighbor ids ((d², id) tie-break). The gate "
        "assembles Facco's d̂ = n / Σ ln(r₂/r₁) (the square halves "
        "the log) and pins d₂ ≥ d₁ and d̂ > 0 — the EFFECTIVE "
        "dimensionality that sizes PQ codebooks and HNSW ef budgets, "
        "complementing the anisotropy spectrum's linear view. Shape: "
        "one broadcast self-join on the capped anchors, one rank "
        "window, one ≤anchors-row fold; production runs the same "
        "readout per ANN bucket"
    ),
    tags=("embeddings", "similarity", "statistics"),
)
def emb_twonn_intrinsic_dim(spark, sf_dir):
    q = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _NN_ANCHORS)
        .select("vec_id", _qvec().alias("qv"))
    )
    a = q.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    p = a.join(F.broadcast(b), F.col("ia") != F.col("ib")).select(
        "ia", "ib", _int_d2_arr("qa", "qb").alias("d2")
    )
    r = p.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("ia").orderBy("d2", "ib")),
    ).filter(F.col("rk") <= 2)
    return r.groupBy("ia").agg(
        F.max(F.when(F.col("rk") == 1, F.col("d2")))
        .cast("bigint")
        .alias("d1_2"),
        F.max(F.when(F.col("rk") == 2, F.col("d2")))
        .cast("bigint")
        .alias("d2_2"),
        F.max(F.when(F.col("rk") == 1, F.col("ib")))
        .cast("bigint")
        .alias("nn1"),
        F.max(F.when(F.col("rk") == 2, F.col("ib")))
        .cast("bigint")
        .alias("nn2"),
    ).withColumnRenamed("ia", "vec_id")
