"""Round-10b batch: forecast-evaluation statistics over the per-type
daily cent series (the reference's Actual-vs-Forecast concern —
TRAIN:169-269 computes R²/MSE; these are the three standard evaluation
tools the same pipeline needs the moment it compares forecasters).

``evt_variance_ratio_test`` — the Lo–MacKinlay variance-ratio test for
the random-walk hypothesis: if the daily series is a random walk, the
variance of q-day differences is q times the variance of 1-day
differences; VR(q) far from 1 means mean-reversion (<1) or trending
(>1). Emits the INTEGER sufficient statistics of both difference
series (n, Σd, Σd²) per type — the gate assembles VR(q) and the
z-statistic. Distinct from `evt_kpss_partial_sums` (level
stationarity) and `evt_rescaled_range` (long memory): VR is the
difference-variance scaling diagnostic.

``evt_pinball_loss`` — quantile-forecast evaluation: the pinball
(quantile) loss of the naive lag-1 forecaster at τ ∈ {0.1, 0.5, 0.9},
the metric every probabilistic-forecast benchmark (M4/M5) scores with.
τ is an integer PERMILLE, losses are exact integer milli-cents:
τ‰·(y−ŷ) when under-forecast, (1000−τ‰)·(ŷ−y) when over.

``evt_diebold_mariano`` — the Diebold–Mariano forecast-comparison
test: loss differential d_t = |e_naive| − |e_seasonal7| (absolute
error, cents) between the lag-1 and the lag-7 seasonal-naive
forecasters, with the INTEGER sufficient statistics (n, Σd, Σd²,
Σ d_t·d_{t−1}) for the HAC lag-1 Newey–West variance — the gate
assembles the DM statistic. The question `evt_mase_backtest` cannot
answer: is forecaster A SIGNIFICANTLY better than B, or just luckier?

Determinism: the daily frame sums exact cents (BIGINT); differences,
pinball terms and loss differentials are integer arithmetic; day
ordering uses row_number over (day) per type (trading-day convention —
calendar gaps are treated as adjacent steps, the `evt_rsi` /
`evt_bollinger_bands` discipline); all outputs are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_VR_Q = 5  # Lo–MacKinlay aggregation horizon (days)
_TAUS = (100, 500, 900)  # pinball quantiles, permille
_DM_SEASON = 7  # seasonal-naive lag (days)

_DAILY_SQL = """
    d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    o AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM d)
"""


def _daily(spark, sf_dir):
    """(event_type, t, x): exact daily cent totals in trading-day order."""
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    return d.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    )


@register(
    "evt_variance_ratio_test",
    oracle=f"""
    WITH {_DAILY_SQL},
    diffs AS (
      SELECT event_type,
             x - lag(x, 1) OVER (PARTITION BY event_type ORDER BY t)
               AS d1,
             x - lag(x, {_VR_Q}) OVER (PARTITION BY event_type ORDER BY t)
               AS dq
      FROM o)
    SELECT event_type,
           CAST(count(d1) AS BIGINT) AS n1,
           CAST(sum(d1) AS BIGINT) AS s1,
           CAST(sum(d1 * d1) AS BIGINT) AS ss1,
           CAST(count(dq) AS BIGINT) AS nq,
           CAST(sum(dq) AS BIGINT) AS sq,
           CAST(sum(dq * dq) AS BIGINT) AS ssq
    FROM diffs GROUP BY event_type
    """,
    description=(
        "Lo–MacKinlay variance-ratio sufficient statistics per event "
        f"type: 1-day and {_VR_Q}-day difference series of the daily "
        "cent totals, each reduced to exact INTEGER (n, Σd, Σd²) — "
        f"the gate assembles VR({_VR_Q}) = (σ²_q/q)/σ²_1 and its "
        "z-statistic, the random-walk diagnostic (VR<1 mean-reverting, "
        ">1 trending) that difference-variance scaling gives and "
        "level-stationarity tests (KPSS) cannot. Shape: one "
        "(type, day) rollup, two lag windows riding ONE type "
        "exchange, one fold"
    ),
    tags=("events", "timeseries", "statistics"),
)
def evt_variance_ratio_test(spark, sf_dir):
    o = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("t")
    diffs = o.select(
        "event_type",
        (F.col("x") - F.lag("x", 1).over(w)).alias("d1"),
        (F.col("x") - F.lag("x", _VR_Q).over(w)).alias("dq"),
    )
    return diffs.groupBy("event_type").agg(
        F.count("d1").cast("bigint").alias("n1"),
        F.sum("d1").cast("bigint").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).cast("bigint").alias("ss1"),
        F.count("dq").cast("bigint").alias("nq"),
        F.sum("dq").cast("bigint").alias("sq"),
        F.sum(F.col("dq") * F.col("dq")).cast("bigint").alias("ssq"),
    )


@register(
    "evt_pinball_loss",
    oracle=f"""
    WITH {_DAILY_SQL},
    e AS (
      SELECT event_type, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY t) AS yhat
      FROM o),
    taus(tau_pm) AS (VALUES {", ".join(f"({t})" for t in _TAUS)})
    SELECT e.event_type, CAST(taus.tau_pm AS BIGINT) AS tau_pm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.x >= e.yhat
                         THEN taus.tau_pm * (e.x - e.yhat)
                         ELSE (1000 - taus.tau_pm) * (e.yhat - e.x)
                    END) AS BIGINT) AS pinball_mc
    FROM e CROSS JOIN taus
    WHERE e.yhat IS NOT NULL
    GROUP BY e.event_type, taus.tau_pm
    """,
    description=(
        "pinball (quantile) loss of the naive lag-1 forecaster over "
        "the daily cent series, at τ ∈ {0.1, 0.5, 0.9} as integer "
        "permille: exact milli-cent loss totals τ‰·(y−ŷ)⁺ + "
        "(1000−τ‰)·(ŷ−y)⁺ per (type, τ) — the probabilistic-forecast "
        "benchmark metric (M4/M5 scoring); τ=500 is 500×MAE, the "
        "asymmetric τ reveal over-/under-forecast cost skew. Shape: "
        "one rollup, one lag window, a 3-row literal τ axis "
        "broadcast-expanded, one fold"
    ),
    tags=("events", "timeseries", "metrics"),
)
def evt_pinball_loss(spark, sf_dir):
    o = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("t")
    e = o.select(
        "event_type", "x", F.lag("x", 1).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    taus = o.sparkSession.createDataFrame(
        [(t,) for t in _TAUS], "tau_pm bigint"
    )
    x, yhat, tau = F.col("x"), F.col("yhat"), F.col("tau_pm")
    loss = F.when(x >= yhat, tau * (x - yhat)).otherwise(
        (1000 - tau) * (yhat - x)
    )
    return (
        e.crossJoin(F.broadcast(taus))
        .groupBy("event_type", "tau_pm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(loss).cast("bigint").alias("pinball_mc"),
        )
    )


@register(
    "evt_diebold_mariano",
    oracle=f"""
    WITH {_DAILY_SQL},
    e AS (
      SELECT event_type, t,
             abs(x - lag(x, 1) OVER (PARTITION BY event_type ORDER BY t))
               AS l1,
             abs(x - lag(x, {_DM_SEASON})
                     OVER (PARTITION BY event_type ORDER BY t)) AS l7
      FROM o),
    dd AS (
      SELECT event_type, t, l1 - l7 AS d
      FROM e WHERE l1 IS NOT NULL AND l7 IS NOT NULL),
    dl AS (
      SELECT event_type, d,
             lag(d, 1) OVER (PARTITION BY event_type ORDER BY t) AS dprev
      FROM dd)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d) AS BIGINT) AS sd,
           CAST(sum(d * d) AS BIGINT) AS sdd,
           CAST(sum(CASE WHEN dprev IS NOT NULL THEN d * dprev END)
                AS BIGINT) AS sd_lag1
    FROM dl GROUP BY event_type
    """,
    description=(
        "Diebold–Mariano forecast-comparison sufficient statistics "
        "per type: loss differential d_t = |naive lag-1 error| − "
        f"|seasonal lag-{_DM_SEASON} error| (absolute cents) reduced "
        "to exact INTEGER (n, Σd, Σd², Σ d·d_prev) — the gate "
        "assembles the DM statistic with the HAC lag-1 Newey–West "
        "variance, answering what MASE backtests cannot: is "
        "forecaster A SIGNIFICANTLY better than B or just luckier. "
        "Shape: one rollup, three lag windows riding ONE type "
        "exchange, one fold"
    ),
    tags=("events", "timeseries", "statistics"),
)
def evt_diebold_mariano(spark, sf_dir):
    o = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("t")
    e = o.select(
        "event_type",
        "t",
        F.abs(F.col("x") - F.lag("x", 1).over(w)).alias("l1"),
        F.abs(F.col("x") - F.lag("x", _DM_SEASON).over(w)).alias("l7"),
    )
    dd = e.filter(
        F.col("l1").isNotNull() & F.col("l7").isNotNull()
    ).select("event_type", "t", (F.col("l1") - F.col("l7")).alias("d"))
    dl = dd.select(
        "event_type",
        "d",
        F.lag("d", 1).over(w).alias("dprev"),
    )
    return dl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum(
            F.when(
                F.col("dprev").isNotNull(), F.col("d") * F.col("dprev")
            )
        )
        .cast("bigint")
        .alias("sd_lag1"),
    )
