"""Round-10j batch: purged cross-validation folds and supplier
lead-time reliability.

``evt_purged_cv_folds`` — purged K-fold with embargo (López de Prado,
"Advances in Financial Machine Learning" ch. 7) over each type's daily
timeline: contiguous rank-blocked test folds (fold = ⌊(rank−1)·K/n⌋ —
pinned integer arithmetic, NOT ntile, whose convention broke round-8
parity), train = days outside [test_start − h, test_end + e] where h
is the label horizon (purge: a trained label whose forward window
leaks into test) and e the embargo (serial-correlation bleed after
test). `evt_walk_forward_mae` evaluates ONE expanding split;
`evt_chrono_split` makes one 70/15/15 cut — purged CV is the
leakage-safe K-fold every financial-ML backtest is supposed to use,
and the fold-accounting table (train/test/excluded per fold) is the
audit that proves no leak. Gate replays the windows and pins
n_test + n_train + n_excluded = n_days.

``rel_leadtime_reliability`` — supplier-nation logistics scorecard:
fulfillment lead time (shipdate − orderdate; the fixture lineitem
carries no commit/receipt dates) as integer-day sufficient statistics
(n, Σd, Σd²) for the reliability coefficient-of-variation, service
adherence against a LITERAL 30-day window, and the late-day tail
total. `rel_otif_fill` scores ORDERS per priority (all-lines-or-
nothing); this scores the SUPPLY side per nation — the vendor-
scorecard view procurement reviews quarterly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_CV_K = 5
_CV_H = 2  # label horizon (purge, days)
_CV_E = 3  # embargo (days)


@register(
    "evt_purged_cv_folds",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
      FROM events WHERE value IS NOT NULL),
    o AS (
      SELECT event_type, day,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    f AS (
      SELECT event_type, r, n,
             ((r - 1) * {_CV_K}) // n AS fold
      FROM o),
    bounds AS (
      SELECT event_type, fold,
             min(r) AS r_lo, max(r) AS r_hi,
             CAST(max(n) AS BIGINT) AS n_days
      FROM f GROUP BY event_type, fold),
    acc AS (
      SELECT b.event_type, b.fold, b.n_days,
             sum(CASE WHEN f.r BETWEEN b.r_lo AND b.r_hi
                      THEN 1 ELSE 0 END) AS n_test,
             sum(CASE WHEN f.r < b.r_lo - {_CV_H}
                        OR f.r > b.r_hi + {_CV_E}
                      THEN 1 ELSE 0 END) AS n_train
      FROM bounds b JOIN f ON f.event_type = b.event_type
      GROUP BY b.event_type, b.fold, b.n_days)
    SELECT event_type, CAST(fold AS BIGINT) AS fold,
           CAST(n_test AS BIGINT) AS n_test,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_days - n_test - n_train AS BIGINT) AS n_excluded
    FROM acc
    """,
    description=(
        f"purged {_CV_K}-fold CV accounting per type: contiguous "
        "rank-block test folds (pinned ⌊(r−1)·K/n⌋ integer fold "
        f"arithmetic), train excludes [test−{_CV_H}, test+{_CV_E}] "
        "(label-horizon purge + serial-correlation embargo, López de "
        "Prado) — the leakage-safe K-fold one-split walk-forwards "
        "can't give; the per-fold train/test/excluded table IS the "
        "no-leak audit. Shape: one distinct-day rollup, rank window "
        "riding the type exchange, a ≤K-row bounds broadcast join, "
        "one fold"
    ),
    tags=("events", "ml-eval", "timeseries"),
)
def evt_purged_cv_folds(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.select(
        "event_type", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("event_type")
    o = d.select(
        "event_type",
        F.row_number().over(w.orderBy("day")).alias("r"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    f = o.select(
        "event_type",
        "r",
        "n",
        F.expr(f"((r - 1) * {_CV_K}) div n").alias("fold"),
    ).localCheckpoint()
    # calendar-bounded fold frame feeds both the bounds and the count
    # join — checkpoint stops the rollup re-derive
    bounds = f.groupBy("event_type", "fold").agg(
        F.min("r").alias("r_lo"),
        F.max("r").alias("r_hi"),
        F.max("n").cast("bigint").alias("n_days"),
    )
    acc = (
        bounds.join(
            f.select("event_type", "r"), "event_type"
        )
        .groupBy("event_type", "fold", "n_days")
        .agg(
            F.sum(
                F.when(
                    F.col("r").between(F.col("r_lo"), F.col("r_hi")), 1
                ).otherwise(0)
            ).alias("n_test"),
            F.sum(
                F.when(
                    (F.col("r") < F.col("r_lo") - _CV_H)
                    | (F.col("r") > F.col("r_hi") + _CV_E),
                    1,
                ).otherwise(0)
            ).alias("n_train"),
        )
    )
    return acc.select(
        "event_type",
        F.col("fold").cast("bigint").alias("fold"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.col("n_train").cast("bigint").alias("n_train"),
        (F.col("n_days") - F.col("n_test") - F.col("n_train"))
        .cast("bigint")
        .alias("n_excluded"),
    )


@register(
    "rel_leadtime_reliability",
    oracle="""
    WITH li AS (
      SELECT s.s_nationkey,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS lead_d
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey),
    li2 AS (
      SELECT s_nationkey, lead_d,
             CASE WHEN lead_d <= 30 THEN 1 ELSE 0 END AS on_time,
             greatest(lead_d - 30, 0) AS late_d
      FROM li)
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(li.on_time) AS BIGINT) AS n_on_time,
           CAST(sum(li.lead_d) AS BIGINT) AS sum_lead_d,
           CAST(sum(li.lead_d * li.lead_d) AS BIGINT) AS sum_lead_d2,
           CAST(sum(li.late_d) AS BIGINT) AS sum_late_d
    FROM li2 li JOIN nation n ON n.n_nationkey = li.s_nationkey
    GROUP BY n.n_name
    """,
    description=(
        "supplier-nation lead-time reliability scorecard: integer-day "
        "fulfillment lead (ship − order) sufficient statistics "
        "(n, Σd, Σd²) for the reliability CV, on-time count vs a "
        "literal 30-day service window, and total late days past it — "
        "the supply-side vendor scorecard next to the order-side OTIF "
        "view. Shape: one orderkey fact-fact equi-join, a suppkey "
        "broadcast join, map-side day arithmetic, a 25-row nation fold"
    ),
    tags=("relational", "logistics", "metrics"),
)
def rel_leadtime_reliability(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lead = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            lead.alias("lead_d"),
            F.when(lead <= 30, 1).otherwise(0).alias("on_time"),
            F.greatest(lead - 30, F.lit(0)).alias("late_d"),
        )
    )
    return j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("on_time").cast("bigint").alias("n_on_time"),
        F.sum("lead_d").cast("bigint").alias("sum_lead_d"),
        F.sum(F.col("lead_d") * F.col("lead_d"))
        .cast("bigint")
        .alias("sum_lead_d2"),
        F.sum("late_d").cast("bigint").alias("sum_late_d"),
    )
