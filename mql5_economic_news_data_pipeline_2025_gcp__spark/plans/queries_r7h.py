"""Round-7 batch h: SQL PIVOT surface + two distribution-free series
diagnostics.

- ``sql_pivot_monthly_status`` — the PIVOT relational surface (Spark
  SQL `PIVOT` clause, planned as a conditional aggregate) with the
  oracle written as the explicit conditional aggregation — pinning
  that Spark's PIVOT plan is exactly the portable FILTER-agg.
- ``evt_records_test`` — count of running records (new maxima) per
  series, the distribution-free trend diagnostic whose null
  expectation is the harmonic number H_n.
- ``evt_fano_factor`` — burstiness of per-day event counts
  (variance-to-mean ratio) per type; Poisson arrivals give F ≈ 1,
  F ≫ 1 flags clumped traffic that breaks iid-sampling assumptions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_PIVOT_SQL = """
    SELECT * FROM (
      SELECT date_trunc('month', o_orderdate) AS month,
             o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders)
    PIVOT (
      sum(price_c) AS rev_c, count(price_c) AS n
      FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p)
    )
    """


@register(
    "sql_pivot_monthly_status",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS o_rev_c,
           CAST(nullif(count(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                AS BIGINT) AS o_n,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS f_rev_c,
           CAST(nullif(count(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                AS BIGINT) AS f_n,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS p_rev_c,
           CAST(nullif(count(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                AS BIGINT) AS p_n
    FROM orders GROUP BY 1
    """,
    description=(
        "the SQL PIVOT relational surface: monthly revenue cents + "
        "order counts pivoted across the three order statuses with "
        "two aggregates per pivot value (Spark's PIVOT clause, planned "
        "as one scan + one hash agg — no extra shuffle for the pivot). "
        "Pins the SURFACE including its semantic wrinkle: a missing "
        "(month, status) combination pivots to NULL even under count() "
        "— Spark pivots PRE-AGGREGATED cells, unlike a raw conditional "
        "count which would give 0 — so the oracle spells the "
        "equivalent NULLIF'd FILTER-aggregate"
    ),
    tags=("relational", "sql-entry", "pivot"),
)
def sql_pivot_monthly_status(spark, sf_dir):
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SQL)


@register(
    "evt_records_test",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, event_type, v,
             max(v) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prior_max
      FROM s)
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN prior_max IS NULL OR v > prior_max
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_records
    FROM r GROUP BY user_id, event_type
    HAVING count(*) >= 8
    """,
    description=(
        "running-records count per series: how many observations set a "
        "new all-time maximum (strictly greater than the prior "
        "cummax). Under exchangeability E[records] = H_n ≈ ln n + γ — "
        "a series with far more records than ln n is trending upward, "
        "with fewer is capped or decaying; the distribution-free trend "
        "diagnostic that needs no variance estimate at all (the "
        "consumer compares n_records against H_n). Exact integers. "
        "Shape: one series shuffle; the prior-cummax window and the "
        "fold share the sort"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_records_test(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select(
        "user_id", "event_type", "ts", "event_id", F.col("value_c").alias("v")
    )
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = s.select(
        "user_id", "event_type", "v", F.max("v").over(w).alias("prior_max")
    )
    is_rec = F.when(
        F.col("prior_max").isNull() | (F.col("v") > F.col("prior_max")), 1
    ).otherwise(0)
    return (
        r.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(is_rec).cast("bigint").alias("n_records"),
        )
        .filter(F.col("n") >= 8)
    )


@register(
    "evt_fano_factor",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sum_c,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM d GROUP BY event_type)
    SELECT event_type, n_days, sum_c, sum_c2,
           (CAST(n_days AS DOUBLE) * CAST(sum_c2 AS DOUBLE)
            - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * CAST(sum_c AS DOUBLE))
             AS fano
    FROM s WHERE sum_c > 0
    """,
    description=(
        "Fano factor (variance-to-mean ratio) of daily event counts "
        "per type: F = (n·Σc² − (Σc)²) / (n·Σc) — exactly 1 under "
        "Poisson arrivals, ≫1 for bursty/clumped traffic whose "
        "'independent rows' assumption breaks naive sampling and "
        "confidence intervals (the event-stream sibling of the "
        "doc-side doc_term_burstiness). Integer moments, one identical "
        "tree. Shape: one (type, day) count agg, one 5-row fold"
    ),
    tags=("events", "statistics"),
)
def evt_fano_factor(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    nd = F.col("n_days").cast("double")
    sc = F.col("sum_c").cast("double")
    sc2 = F.col("sum_c2").cast("double")
    return s.filter(F.col("sum_c") > 0).select(
        "event_type",
        "n_days",
        "sum_c",
        "sum_c2",
        ((nd * sc2 - sc * sc) / (nd * sc)).alias("fano"),
    )
