"""Round-9 batch y: robust time-series repair and payments audit.

``evt_hampel_filter`` — the Hampel identifier over each type's daily
series: a centered 7-day window's MEDIAN and MAD decide whether the
middle day is an outlier (|x − med| > 3 · 1.4826 · MAD, evaluated as
the cross-multiplied integer comparison 10000·|x−med| > 44478·MAD).
The rolling-robust repair step a forecasting pipeline runs before
fitting — unlike `evt_anomaly_zscore` (global mean/σ, mask-sensitive)
or `evt_grubbs_outlier` (single point), Hampel is local and
breakdown-resistant.  Window medians are exact: the 7-element window
array is sorted and indexed, in both engines.

``rel_duplicate_payments`` — the classic payments-audit double-charge
scan: payments by the same customer for the SAME cent amount within 7
days of each other.  The fixture order amounts are fully dispersed
(zero organic collisions measured at sf0.01 even under $100 rounding),
so the payments feed is the orders table plus a DETERMINISTICALLY
dirtied re-submission stream — every 17th order re-posted 3 days later
under a negated key — giving the detector a measurable ground truth,
the `rel_entity_resolution` discipline applied to audit analytics.
Blocking on (custkey, amount cents) makes the candidate space
tiny-bucket before the date check; the gate pins perfect
precision/recall against the injection rule.

Determinism: window membership is ROWS BETWEEN 3 PRECEDING AND 3
FOLLOWING over (day) with full-window gating (count = 7); medians are
element 4 of the sorted integer array; the Hampel test is division-free
cross-multiplication; date proximity uses datediff on DATE values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

#: 3·1.4826·MAD scaled: 10000·|dev| > 44478·MAD
_HAMPEL_NUM = 44478
_HAMPEL_DEN = 10000


@register(
    "evt_hampel_filter",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    w AS (
      SELECT event_type, day, x,
             list(x) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS win
      FROM d),
    m AS (
      SELECT event_type, day, x, win,
             list_sort(win)[4] AS med7
      FROM w WHERE len(win) = 7),
    dev AS (
      SELECT event_type, day, x, med7,
             list_sort(list_transform(win, v -> abs(v - med7)))[4] AS mad7
      FROM m)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN {_HAMPEL_DEN} * abs(x - med7)
                              > {_HAMPEL_NUM} * mad7
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(max(CASE WHEN {_HAMPEL_DEN} * abs(x - med7)
                              > {_HAMPEL_NUM} * mad7
                         THEN abs(x - med7) END) AS BIGINT)
             AS max_flagged_dev,
           CAST(min(CASE WHEN {_HAMPEL_DEN} * abs(x - med7)
                              > {_HAMPEL_NUM} * mad7
                         THEN day END) AS VARCHAR) AS first_flagged_day
    FROM dev GROUP BY event_type
    """,
    description=(
        "Hampel outlier identifier per event_type daily series: the "
        "centered 7-day window's exact MEDIAN (element 4 of the "
        "sorted integer window array) and MAD decide the middle day, "
        "via the division-free test 10⁴·|x − med| > 44478·MAD "
        "(= 3·1.4826·MAD cross-multiplied); edge days with partial "
        "windows are excluded (count = 7 gating). Emits per type the "
        "evaluated-window count, flag count, worst flagged deviation "
        "and first flagged day — the local, breakdown-resistant "
        "repair signal global z-scores can't give. Shape: one "
        "(type, day) rollup, one type window collecting 7-element "
        "arrays, map-side sorts of 7, one fold riding the window "
        "exchange"
    ),
    tags=("events", "timeseries", "statistics"),
)
def evt_hampel_filter(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    w = d.select(
        "event_type",
        "day",
        "x",
        F.collect_list("x").over(w7).alias("win"),
    ).filter(F.size("win") == 7)
    m = w.select(
        "event_type",
        "day",
        "x",
        F.expr("element_at(array_sort(win), 4)").alias("med7"),
        "win",
    )
    dev = m.select(
        "event_type",
        "day",
        "x",
        "med7",
        F.expr(
            "element_at(array_sort(transform(win, v -> abs(v - med7))), 4)"
        ).alias("mad7"),
    )
    flagged = (
        _HAMPEL_DEN * F.abs(F.col("x") - F.col("med7"))
        > _HAMPEL_NUM * F.col("mad7")
    )
    return dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum(F.when(flagged, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.max(F.when(flagged, F.abs(F.col("x") - F.col("med7"))))
        .cast("bigint")
        .alias("max_flagged_dev"),
        F.min(F.when(flagged, F.col("day")))
        .cast("string")
        .alias("first_flagged_day"),
    )


@register(
    "rel_duplicate_payments",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS amount_c,
             CAST(o_orderdate AS DATE) AS od
      FROM orders),
    feed AS (
      SELECT o_orderkey, o_custkey, amount_c, od FROM base
      UNION ALL
      -- deterministically dirtied re-submissions: every 17th order
      -- re-posted 3 days later under a NEGATED key (the ground truth;
      -- negative keys are disjoint from genuine orderkeys at ANY SF —
      -- a fixed +5e6 offset collides with real keys from sf1 up)
      SELECT -o_orderkey - 1, o_custkey, amount_c, od + 3
      FROM base WHERE o_orderkey % 17 = 0),
    pairs AS (
      SELECT a.o_custkey AS custkey, a.amount_c,
             a.o_orderkey AS ok_a, b.o_orderkey AS ok_b,
             CAST(abs(datediff('day', a.od, b.od)) AS BIGINT) AS gap_days
      FROM feed a JOIN feed b
        ON a.o_custkey = b.o_custkey
       AND a.amount_c = b.amount_c
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(datediff('day', a.od, b.od)) <= 7)
    SELECT custkey, CAST(amount_c AS BIGINT) AS amount_c,
           CAST(ok_a AS BIGINT) AS ok_a, CAST(ok_b AS BIGINT) AS ok_b,
           gap_days
    FROM pairs
    """,
    description=(
        "duplicate-payment audit scan with measurable ground truth: "
        "the payments feed is orders plus a deterministically dirtied "
        "re-submission stream (every 17th order re-posted 3 days "
        "later under a negated key — fixture amounts have ZERO "
        "organic collisions, measured), and the detector flags "
        "same-customer same-cent-amount pairs within 7 days. "
        "Blocking on (custkey, amount) makes the self-join tiny-"
        "bucket before the date predicate — the entity-resolution "
        "blocking discipline applied to audit analytics; the gate "
        "pins PERFECT precision/recall against the injection rule. "
        "Shape: one (custkey, amount) self-join — blocking keys "
        "bound every bucket at any scale, no cross product"
    ),
    tags=("relational", "audit", "dedup"),
)
def rel_duplicate_payments(spark, sf_dir):
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "amount_c"
        ),
        F.to_date("o_orderdate").alias("od"),
    )
    dups = base.filter(F.col("o_orderkey") % 17 == 0).select(
        # negated key (-k - 1): strictly negative for every k >= 0,
        # so disjoint from genuine orderkeys at ANY scale factor (a
        # fixed offset collides with real keys from sf1 up; bare -k
        # collides with itself at k = 0)
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        "o_custkey",
        "amount_c",
        F.date_add("od", 3).alias("od"),
    )
    feed = base.unionByName(dups)
    a = feed.select(
        F.col("o_custkey").alias("custkey"),
        "amount_c",
        F.col("o_orderkey").alias("ok_a"),
        F.col("od").alias("od_a"),
    )
    b = feed.select(
        F.col("o_custkey").alias("custkey"),
        "amount_c",
        F.col("o_orderkey").alias("ok_b"),
        F.col("od").alias("od_b"),
    )
    return (
        a.join(b, ["custkey", "amount_c"])
        .filter(
            (F.col("ok_a") < F.col("ok_b"))
            & (F.abs(F.datediff("od_a", "od_b")) <= 7)
        )
        .select(
            "custkey",
            F.col("amount_c").cast("bigint").alias("amount_c"),
            F.col("ok_a").cast("bigint").alias("ok_a"),
            F.col("ok_b").cast("bigint").alias("ok_b"),
            F.abs(F.datediff("od_a", "od_b"))
            .cast("bigint")
            .alias("gap_days"),
        )
    )
