"""Round-10f batch: conformal prediction and BG/NBD lifetime inputs.

``evt_conformal_prediction`` — split-conformal prediction intervals
(Vovk; Lei et al.) for the naive lag-1 forecaster on each type's daily
cent series: calibrate the 90% quantile of absolute residuals on the
chronological first 70% (nearest-rank order statistic
k = ⌈0.9·(n+1)⌉, the finite-sample-valid choice), then measure
empirical coverage of ŷ ± q on the held-out 30%. THE
distribution-free uncertainty wrapper modern forecast pipelines
deploy; `evt_calibration_bins` checks probability calibration,
this checks INTERVAL calibration. Split is the integer
cross-multiplication 10·t ≤ 7·n (the `evt_chrono_split` convention).

``evt_bgnbd_summary`` — the (x, t_x, T) sufficient-statistic triple of
the BG/NBD repeat-purchase model (Fader–Hardie 2005), folded per
repeat-count cell: for each user, x = repeat purchases, t_x = days
from first to last purchase (recency), T = days from first purchase to
the calendar end. BG/NBD likelihood depends on the data ONLY through
these triples, so the per-x rollup (n_users, Σt_x, ΣT) is exactly what
a fitter consumes — the classic CLV input `rel_rfm_scores` (scoring)
and `evt_cohort_ltv_curve` (realized value) do not provide.

Determinism: residuals and quantiles are exact integer cents
(nearest-rank, no interpolation); recency/age are integer day
differences against the literal-free calendar max (a scalar aggregate
both engines compute identically on DATE values).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_COV_PM = 900  # target coverage, permille
_TRAIN_NUM, _TRAIN_DEN = 7, 10  # chronological 70% calibration split


@register(
    "evt_conformal_prediction",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    o AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    r AS (
      SELECT event_type, t, n,
             abs(x - lag(x, 1) OVER (PARTITION BY event_type ORDER BY t))
               AS res
      FROM o),
    res AS (SELECT * FROM r WHERE res IS NOT NULL),
    train AS (
      SELECT event_type, res,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY res, t) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n_train
      FROM res WHERE {_TRAIN_DEN} * t <= {_TRAIN_NUM} * n),
    q AS (
      SELECT event_type, res AS q_c, n_train
      FROM train
      WHERE rk = least(n_train,
                       CAST(ceil({_COV_PM} * (n_train + 1) / 1000.0)
                            AS BIGINT))),
    test AS (
      SELECT event_type, res FROM res
      WHERE {_TRAIN_DEN} * t > {_TRAIN_NUM} * n)
    SELECT q.event_type,
           CAST(q.n_train AS BIGINT) AS n_train,
           CAST(q.q_c AS BIGINT) AS q_c,
           CAST(count(test.res) AS BIGINT) AS n_test,
           CAST(coalesce(sum(CASE WHEN test.res <= q.q_c
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_covered
    FROM q LEFT JOIN test ON test.event_type = q.event_type
    GROUP BY q.event_type, q.n_train, q.q_c
    """,
    description=(
        "split-conformal prediction intervals for the naive lag-1 "
        "forecaster: 90%-quantile of absolute train residuals by the "
        "finite-sample nearest-rank k = ⌈0.9·(n+1)⌉ on the "
        "chronological first 70% (integer cross-multiplied split), "
        "then held-out coverage of ŷ ± q — the distribution-free "
        "uncertainty wrapper; the gate pins the conformal validity "
        "direction and the order-statistic choice. Shape: one "
        "(type, day) rollup, lag + rank windows riding the type "
        "exchange, one broadcast quantile join, one fold"
    ),
    tags=("events", "timeseries", "metrics"),
)
def evt_conformal_prediction(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    o = d.select(
        "event_type",
        "x",
        F.row_number().over(wd).alias("t"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    wt = Window.partitionBy("event_type").orderBy("t")
    res = o.select(
        "event_type",
        "t",
        "n",
        F.abs(F.col("x") - F.lag("x", 1).over(wt)).alias("res"),
    ).filter(F.col("res").isNotNull()).localCheckpoint()
    # the residual frame feeds BOTH the calibration rank and the test
    # coverage scan — calendar-bounded, checkpoint kills the re-derive
    train = res.filter(
        _TRAIN_DEN * F.col("t") <= _TRAIN_NUM * F.col("n")
    ).select(
        "event_type",
        "res",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("res", "t"))
        .alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_train"),
    )
    q = train.filter(
        F.col("rk")
        == F.least(
            F.col("n_train"),
            F.ceil(_COV_PM * (F.col("n_train") + 1) / 1000.0).cast(
                "bigint"
            ),
        )
    ).select(
        "event_type",
        F.col("n_train").cast("bigint").alias("n_train"),
        F.col("res").cast("bigint").alias("q_c"),
    )
    test = res.filter(
        _TRAIN_DEN * F.col("t") > _TRAIN_NUM * F.col("n")
    ).select("event_type", F.col("res").alias("test_res"))
    return (
        q.join(test, "event_type", "left")
        .groupBy("event_type", "n_train", "q_c")
        .agg(
            F.count("test_res").cast("bigint").alias("n_test"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("test_res") <= F.col("q_c"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )


@register(
    "evt_bgnbd_summary",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'),
    cal AS (SELECT max(day) AS end_day FROM p),
    u AS (
      SELECT user_id,
             CAST(count(*) - 1 AS BIGINT) AS x,
             CAST(datediff('day', min(day), max(day)) AS BIGINT) AS t_x,
             CAST(datediff('day', min(day), (SELECT end_day FROM cal))
                  AS BIGINT) AS big_t
      FROM p GROUP BY user_id)
    SELECT x,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(t_x) AS BIGINT) AS sum_tx_days,
           CAST(sum(big_t) AS BIGINT) AS sum_t_days
    FROM u GROUP BY x
    """,
    description=(
        "BG/NBD repeat-purchase sufficient statistics (Fader–Hardie): "
        "per user x = repeat purchases, t_x = first→last purchase days "
        "(recency), T = first purchase→calendar end days (age), folded "
        "into the per-x rollup (n_users, Σt_x, ΣT) — the likelihood "
        "depends on the data only through these, so this table IS the "
        "fitter's input; the gate pins t_x ≤ T and the x=0 ⇒ t_x=0 "
        "identity. Shape: one purchase-day fold per user, a scalar "
        "calendar-max broadcast, one |distinct x|-row rollup"
    ),
    tags=("events", "ltv", "statistics"),
)
def evt_bgnbd_summary(spark, sf_dir):
    p = (
        keyed_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
    )
    cal = p.agg(F.max("day").alias("end_day"))
    u = p.groupBy("user_id").agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("x"),
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
    )
    u = u.crossJoin(F.broadcast(cal)).select(
        "x",
        F.datediff("last_day", "first_day").cast("bigint").alias("t_x"),
        F.datediff("end_day", "first_day").cast("bigint").alias("big_t"),
    )
    return u.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("t_x").cast("bigint").alias("sum_tx_days"),
        F.sum("big_t").cast("bigint").alias("sum_t_days"),
    )
