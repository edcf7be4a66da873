"""Round-10h batch: L-moments and neighborhood trustworthiness.

``evt_l_moments`` — sample L-moment numerators per type over the daily
cent series (Hosking 1990): B_k = Σ x₍ᵢ₎·(i−1)(i−2)…(i−k), the
order-statistic weighted sums the probability-weighted-moment
estimators b_k are built from. L-moments are the robust
distribution-shape system (L-CV, L-skewness t₃, L-kurtosis t₄ exist
whenever the mean does, are near-unbiased at small n, and are THE
standard for fitting the GEV/Gumbel tails `evt_extreme_value_gumbel`
uses) — the lens classical skew/kurtosis (`evt_moment_skew_kurtosis`,
cube/fourth-power moments with unbounded influence) cannot give
robustly. Engines emit exact integer numerators; the gate divides by
the binomial normalizers and assembles λ₁..λ₄, t₃, t₄.

``emb_trustworthiness`` — the trustworthiness penalty of the 16-dim
matryoshka PREFIX against the full 64-dim space, per query of a
32-query literal panel: intruders are points in the reduced top-5 but
not the full top-5, each charged its full-space rank displacement
(r_full − k). This is the dimensionality-reduction QA standard (Venna
& Kaski) and strictly finer than `emb_matryoshka_recall`'s overlap
count: recall says HOW MANY neighbors survive truncation,
trustworthiness says how BADLY the fakes mislead.

Determinism: L-moment weights are integer falling factorials on
row_number ranks (ties ordered by (x, t) — the weighted sum is
tie-order invariant because tied x share the same value); embedding
coordinates quantize to integer millis; both rank windows break ties
on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_TW_QUERIES = 32
_TW_K = 5
_TW_PREFIX = 16


@register(
    "evt_l_moments",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    o AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, day) AS i
      FROM d)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS b0_num,
           CAST(sum(x * (i - 1)) AS BIGINT) AS b1_num,
           CAST(sum(x * (i - 1) * (i - 2)) AS BIGINT) AS b2_num,
           CAST(sum(x * (i - 1) * (i - 2) * (i - 3)) AS BIGINT)
             AS b3_num
    FROM o GROUP BY event_type
    """,
    description=(
        "sample L-moment numerators per type (Hosking PWM estimators): "
        "Σ x₍ᵢ₎·(i−1)…(i−k) over rank-ordered daily cents for k = 0..3 "
        "— exact integers; the gate normalizes by n·(n−1)…(n−k) and "
        "assembles λ₁..λ₄ and the L-skewness/L-kurtosis ratios, the "
        "robust shape system GEV/Gumbel fitting runs on (every sample "
        "L-moment exists whenever the mean does — no cube/fourth-power "
        "influence blowup). Shape: one (type, day) rollup, one rank "
        "window riding the type exchange, one fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_l_moments(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    o = d.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("i"),
    )
    i, x = F.col("i"), F.col("x")
    return o.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("b0_num"),
        F.sum(x * (i - 1)).cast("bigint").alias("b1_num"),
        F.sum(x * (i - 1) * (i - 2)).cast("bigint").alias("b2_num"),
        F.sum(x * (i - 1) * (i - 2) * (i - 3))
        .cast("bigint")
        .alias("b3_num"),
    )


@register(
    "emb_trustworthiness",
    oracle=f"""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT)
               AS x
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             sum((c.x - q.x) * (c.x - q.x)) AS d_full,
             sum(CASE WHEN c.idx <= {_TW_PREFIX}
                      THEN (c.x - q.x) * (c.x - q.x) ELSE 0 END)
               AS d_red
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE q.vec_id < {_TW_QUERIES} AND c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    ranked AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY d_full, cid) AS r_full,
             row_number() OVER (PARTITION BY qid
                                ORDER BY d_red, cid) AS r_red
      FROM pairs)
    SELECT qid,
           CAST(count(*) FILTER (r_red <= {_TW_K}
                                 AND r_full > {_TW_K}) AS BIGINT)
             AS n_intruders,
           CAST(coalesce(sum(r_full - {_TW_K})
                           FILTER (r_red <= {_TW_K}
                                   AND r_full > {_TW_K}), 0) AS BIGINT)
             AS penalty
    FROM ranked GROUP BY qid
    """,
    description=(
        f"trustworthiness of the {_TW_PREFIX}-dim matryoshka prefix vs "
        f"the full space, per query of a {_TW_QUERIES}-query literal "
        f"panel: intruders (reduced top-{_TW_K} ∉ full top-{_TW_K}) "
        "charged their full-space rank displacement r_full − k (Venna–"
        "Kaski) — finer than recall: how badly the fakes mislead, not "
        "just how many. The gate brute-forces both rankings and "
        "assembles T(k). Shape: bounded panel broadcast against one "
        "corpus scan, two rank windows on the query-partitioned "
        "frame, one fold"
    ),
    tags=("embeddings", "ann", "diagnostics"),
)
def emb_trustworthiness(spark, sf_dir):
    from .queries_r6 import _qvec

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("q")
    )
    queries = emb.filter(F.col("vec_id") < _TW_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    d_full = F.aggregate(
        F.zip_with(F.col("qv"), F.col("q"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    d_red = F.aggregate(
        F.zip_with(
            F.slice(F.col("qv"), 1, _TW_PREFIX),
            F.slice(F.col("q"), 1, _TW_PREFIX),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    d2 = pairs.select(
        "qid",
        F.col("vec_id").alias("cid"),
        d_full.alias("d_full"),
        d_red.alias("d_red"),
    )
    wq = Window.partitionBy("qid")
    ranked = d2.select(
        "qid",
        F.row_number().over(wq.orderBy("d_full", "cid")).alias("r_full"),
        F.row_number().over(wq.orderBy("d_red", "cid")).alias("r_red"),
    )
    intr = (F.col("r_red") <= _TW_K) & (F.col("r_full") > _TW_K)
    return ranked.groupBy("qid").agg(
        F.sum(F.when(intr, 1).otherwise(0))
        .cast("bigint")
        .alias("n_intruders"),
        F.coalesce(
            F.sum(F.when(intr, F.col("r_full") - _TW_K)), F.lit(0)
        )
        .cast("bigint")
        .alias("penalty"),
    )
