"""Round-11a batch: rank-exact two-sample tests — Cramér–von Mises and
Cucconi — per user between the purchase and view spend distributions.

``evt_cramer_von_mises`` — the two-sample Cramér–von Mises criterion
(Anderson 1962) per user: where `evt_ks_drift` reads the single worst
ECDF gap and `evt_wasserstein_1d` the total transport, CvM integrates
the SQUARED gap over the whole support — the omnibus middleweight that
catches broad shape differences a max-statistic misses. The rank form
U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)² (pooled ranks r,s vs within-sample
indices i,j) is pure integer arithmetic; the criterion
T = U/(nmN) − (4nm−1)/(6N) is emitted as one exact rational
t_num/t_den = (6U − nm(4nm−1)) / (6nmN).

``evt_cucconi_test`` — the Cucconi (1968) location–scale test per
user: jointly sensitive to mean AND variance shifts through squared
pooled ranks, Σr² and its reflection Σ(N+1−r)², the classical
pre-Lepage rank statistic. The standardized U/V/C assembly (which
needs square roots) lives in the pytest gate; the registry row carries
the integer sufficient statistics both engines must agree on exactly.

Both share one plan shape: one exchange on user_id, ONE window sort by
(value_c, event_id) — the within-sample index is a running conditional
count over the POOLED window, so the (user, sample) re-partition a
second window would force never happens. Ranks are permutation-exact
via the unique event_id tie-break (determinism contract: ties broken,
not midranked — documented deviation from the midrank textbook form,
identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_X, _Y = "purchase", "view"


def _pooled_ranked(spark, sf_dir):
    """(user_id, grp, r, i): pooled rank r and within-sample index i of
    every purchase/view cent value, one user_id exchange, one sort."""
    ev = keyed_events(spark, sf_dir).filter(
        F.col("event_type").isin(_X, _Y) & F.col("value").isNotNull()
    )
    pooled = Window.partitionBy("user_id").orderBy("value_c", "event_id")
    running = pooled.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        F.col("event_type").alias("grp"),
        F.row_number().over(pooled).alias("r"),
        F.sum(
            F.when(F.col("event_type") == _X, 1).otherwise(0)
        ).over(running).alias("cum_x"),
        F.sum(
            F.when(F.col("event_type") == _Y, 1).otherwise(0)
        ).over(running).alias("cum_y"),
    ).select(
        "user_id",
        "grp",
        "r",
        F.when(F.col("grp") == _X, F.col("cum_x"))
        .otherwise(F.col("cum_y"))
        .alias("i"),
    )


_RANK_CTE = f"""
    ranked AS (
      SELECT user_id, event_type AS grp,
             row_number() OVER w AS r,
             sum(CASE WHEN event_type = '{_X}' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(round(value*100) AS BIGINT), event_id
                     ROWS UNBOUNDED PRECEDING) AS cum_x,
             sum(CASE WHEN event_type = '{_Y}' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(round(value*100) AS BIGINT), event_id
                     ROWS UNBOUNDED PRECEDING) AS cum_y
      FROM events
      WHERE event_type IN ('{_X}', '{_Y}') AND value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(round(value*100) AS BIGINT), event_id)),
    idx AS (
      SELECT user_id, grp, r,
             CASE WHEN grp = '{_X}' THEN cum_x ELSE cum_y END AS i
      FROM ranked)
"""


@register(
    "evt_cramer_von_mises",
    oracle=f"""
    WITH {_RANK_CTE},
    parts AS (
      SELECT user_id,
             sum(CASE WHEN grp = '{_X}' THEN 1 ELSE 0 END) AS n,
             sum(CASE WHEN grp = '{_Y}' THEN 1 ELSE 0 END) AS m,
             sum(CASE WHEN grp = '{_X}'
                      THEN (r - i) * (r - i) ELSE 0 END) AS sx,
             sum(CASE WHEN grp = '{_Y}'
                      THEN (r - i) * (r - i) ELSE 0 END) AS sy
      FROM idx GROUP BY user_id)
    SELECT user_id,
           CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
           CAST(n * sx + m * sy AS BIGINT) AS u_stat,
           CAST(6 * (n * sx + m * sy) - n * m * (4 * n * m - 1)
                AS BIGINT) AS t_num,
           CAST(6 * n * m * (n + m) AS BIGINT) AS t_den
    FROM parts WHERE n > 0 AND m > 0
    """,
    description=(
        "two-sample Cramér–von Mises criterion per user (purchase vs "
        "view cents): rank form U = n·Σ(r−i)² + m·Σ(s−j)² on "
        "tie-broken pooled ranks, plus the criterion T as the exact "
        "rational (6U − nm(4nm−1)) / 6nmN — the omnibus squared-ECDF "
        "companion to the KS max-gap and Wasserstein transport views. "
        "Shape: ONE user_id exchange and ONE window sort (within-"
        "sample indices are running conditional counts over the "
        "pooled window), then a per-user aggregate"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_cramer_von_mises(spark, sf_dir):
    idx = _pooled_ranked(spark, sf_dir)
    d2 = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    parts = idx.groupBy("user_id").agg(
        F.sum(F.when(F.col("grp") == _X, 1).otherwise(0)).alias("n"),
        F.sum(F.when(F.col("grp") == _Y, 1).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("grp") == _X, d2).otherwise(0)).alias("sx"),
        F.sum(F.when(F.col("grp") == _Y, d2).otherwise(0)).alias("sy"),
    )
    n, m = F.col("n"), F.col("m")
    u = n * F.col("sx") + m * F.col("sy")
    return parts.filter((n > 0) & (m > 0)).select(
        "user_id",
        n.cast("bigint").alias("n"),
        m.cast("bigint").alias("m"),
        u.cast("bigint").alias("u_stat"),
        (F.lit(6) * u - n * m * (F.lit(4) * n * m - 1))
        .cast("bigint")
        .alias("t_num"),
        (F.lit(6) * n * m * (n + m)).cast("bigint").alias("t_den"),
    )


@register(
    "evt_cucconi_test",
    oracle=f"""
    WITH {_RANK_CTE},
    tot AS (
      SELECT user_id, count(*) AS nn FROM idx GROUP BY user_id)
    SELECT i.user_id,
           CAST(sum(CASE WHEN grp = '{_X}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n,
           CAST(sum(CASE WHEN grp = '{_Y}' THEN 1 ELSE 0 END)
                AS BIGINT) AS m,
           CAST(sum(CASE WHEN grp = '{_X}' THEN r * r ELSE 0 END)
                AS BIGINT) AS s1,
           CAST(sum(CASE WHEN grp = '{_X}'
                    THEN (t.nn + 1 - r) * (t.nn + 1 - r) ELSE 0 END)
                AS BIGINT) AS s2
    FROM idx i JOIN tot t ON t.user_id = i.user_id
    GROUP BY i.user_id
    HAVING sum(CASE WHEN grp = '{_X}' THEN 1 ELSE 0 END) > 0
       AND sum(CASE WHEN grp = '{_Y}' THEN 1 ELSE 0 END) > 0
    """,
    description=(
        "Cucconi location–scale test per user (purchase vs view "
        "cents), integer sufficient statistics: sample sizes plus "
        "Σr² and the reflected Σ(N+1−r)² of the first sample's "
        "tie-broken pooled ranks — jointly mean- and variance-"
        "sensitive where Wilcoxon (location) and Ansari-style "
        "(scale) ranks each see half the story; the standardized "
        "U/V/C assembly lives in the pytest gate. Same one-exchange "
        "one-sort plan as evt_cramer_von_mises"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_cucconi_test(spark, sf_dir):
    idx = _pooled_ranked(spark, sf_dir)
    w = Window.partitionBy("user_id")
    with_n = idx.withColumn("nn", F.count(F.lit(1)).over(w))
    refl = F.col("nn") + 1 - F.col("r")
    parts = with_n.groupBy("user_id").agg(
        F.sum(F.when(F.col("grp") == _X, 1).otherwise(0)).alias("n"),
        F.sum(F.when(F.col("grp") == _Y, 1).otherwise(0)).alias("m"),
        F.sum(
            F.when(F.col("grp") == _X, F.col("r") * F.col("r")).otherwise(0)
        ).alias("s1"),
        F.sum(F.when(F.col("grp") == _X, refl * refl).otherwise(0)).alias(
            "s2"
        ),
    )
    return parts.filter((F.col("n") > 0) & (F.col("m") > 0)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("m").cast("bigint").alias("m"),
        F.col("s1").cast("bigint").alias("s1"),
        F.col("s2").cast("bigint").alias("s2"),
    )
