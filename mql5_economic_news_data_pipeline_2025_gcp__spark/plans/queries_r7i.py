"""Round-7 batch i: supply-chain and arrival dynamics — the bullwhip
variance-amplification ratio, on-time-in-full order fill, and
inter-arrival coefficient of variation. Integer moments everywhere;
ratios as single identical trees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "rel_bullwhip_ratio",
    oracle="""
    WITH o AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1),
    s AS (
      SELECT date_trunc('month', l_shipdate) AS mon,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1),
    om AS (
      SELECT CAST(count(*) AS BIGINT) AS n_mon,
             CAST(sum(n) AS BIGINT) AS sn,
             CAST(sum(n * n) AS BIGINT) AS qn
      FROM o),
    sm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_mon,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(q * q) AS BIGINT) AS qq
      FROM s)
    SELECT om.n_mon AS order_months, sm.n_mon AS ship_months,
           om.sn AS orders_total, sm.sq AS shipped_total,
           ((CAST(om.n_mon AS DOUBLE) * CAST(om.qn AS DOUBLE)
             - CAST(om.sn AS DOUBLE) * CAST(om.sn AS DOUBLE))
            / (CAST(om.sn AS DOUBLE) * CAST(om.sn AS DOUBLE)))
           / ((CAST(sm.n_mon AS DOUBLE) * CAST(sm.qq AS DOUBLE)
             - CAST(sm.sq AS DOUBLE) * CAST(sm.sq AS DOUBLE))
            / (CAST(sm.sq AS DOUBLE) * CAST(sm.sq AS DOUBLE)))
             AS bullwhip
    FROM om, sm
    """,
    description=(
        "bullwhip variance-amplification ratio: squared coefficient of "
        "variation of monthly ORDER counts over squared CV of monthly "
        "SHIPPED quantity — CV² = (n·Σx² − S²)/S² per series, so the "
        "ratio is one identical tree over six integer moments. "
        "Bullwhip > 1 means order placement is noisier than physical "
        "demand (the upstream-amplification signal inventory planners "
        "watch). Shape: two independent month rollups (orders scan, "
        "lineitem scan), scalar cross join of two 1-row moment frames"
    ),
    tags=("relational", "operations", "timeseries"),
)
def rel_bullwhip_ratio(spark, sf_dir):
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mon"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("mon"))
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    om = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mon"),
        F.sum("n").cast("bigint").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("qn"),
    )
    sm = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_mon"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("qq"),
    )
    j = om.crossJoin(sm)
    cv2 = lambda n, s_, q: (  # noqa: E731
        n.cast("double") * q.cast("double") - s_.cast("double") * s_.cast("double")
    ) / (s_.cast("double") * s_.cast("double"))
    return j.select(
        F.col("n_mon").alias("order_months"),
        F.col("m_mon").alias("ship_months"),
        F.col("sn").alias("orders_total"),
        F.col("sq").alias("shipped_total"),
        (
            cv2(F.col("n_mon"), F.col("sn"), F.col("qn"))
            / cv2(F.col("m_mon"), F.col("sq"), F.col("qq"))
        ).alias("bullwhip"),
    )


@register(
    "rel_otif_fill",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS worst_lag_days,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN worst_lag_days <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_otif_90d,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN worst_lag_days <= 90 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS otif_rate
    FROM per_order GROUP BY o_orderpriority
    """,
    description=(
        "on-time-in-full (OTIF) fill rate per order priority: an order "
        "counts as OTIF iff its WORST line-item ship lag (max over "
        "lines of shipdate − orderdate) is within the 90-day service "
        "window — the all-lines-or-nothing semantics that separates "
        "OTIF from plain line-level on-time rates. Integer day lags "
        "and counts; the rate is one division tree. Shape: one "
        "orderkey equi-join (the natural co-partitioned fact-fact "
        "join), per-order max fold, 5-row priority fold"
    ),
    tags=("relational", "operations"),
)
def rel_otif_fill(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.max(F.datediff(F.col("sd"), F.col("od")))
            .cast("bigint")
            .alias("worst_lag_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    otif = F.when(F.col("worst_lag_days") <= 90, 1).otherwise(0)
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(otif).cast("bigint").alias("n_otif_90d"),
        F.sum("n_lines").cast("bigint").alias("n_lines"),
        (F.sum(otif).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "otif_rate"
        ),
    )


@register(
    "evt_interarrival_cv",
    oracle="""
    WITH s AS (
      SELECT event_type, ts, event_id, epoch_us(ts) AS us
      FROM events),
    g AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS gap_us
      FROM s),
    m AS (
      SELECT event_type,
             CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(sum(gap_us) AS BIGINT) AS sg,
             CAST(sum(CAST(gap_us AS HUGEINT) * gap_us) AS HUGEINT) AS qg
      FROM g GROUP BY event_type)
    SELECT event_type, n_gaps, sg AS gap_sum_us,
           (CAST(n_gaps AS DOUBLE) * CAST(qg AS DOUBLE)
            - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
             / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) AS cv2
    FROM m WHERE sg > 0
    """,
    description=(
        "inter-arrival coefficient of variation per event type: CV² = "
        "(n·Σg² − (Σg)²)/(Σg)² over exact integer µs gaps — the "
        "arrival-process diagnostic paired with evt_fano_factor "
        "(CV² ≈ 1 for Poisson arrivals, > 1 bursty, < 1 regular/"
        "scheduled); bursty arrivals mean time-sliced samples are not "
        "exchangeable. Shape: one per-type lag window and one moment "
        "fold sharing the sort"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_interarrival_cv(spark, sf_dir):
    from pyspark.sql import Window

    ev = keyed_events(spark, sf_dir)
    s = ev.select(
        "event_type", "ts", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = s.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    )
    dec = "decimal(38,0)"
    m = g.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("sg"),
        F.sum(F.col("gap_us").cast(dec) * F.col("gap_us")).cast(dec).alias("qg"),
    )
    nd = F.col("n_gaps").cast("double")
    sg = F.col("sg").cast("double")
    qg = F.col("qg").cast("double")
    return m.filter(F.col("sg") > 0).select(
        "event_type",
        "n_gaps",
        F.col("sg").alias("gap_sum_us"),
        ((nd * qg - sg * sg) / (sg * sg)).alias("cv2"),
    )
