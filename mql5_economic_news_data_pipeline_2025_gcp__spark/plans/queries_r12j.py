"""Round-12j batch: variogram lags and Theil's U2 forecast skill.

``evt_variogram_lags`` — the empirical structure function of each
type's daily cent series at lags h = 1..5: pair counts, Σ|Δ_h| (the
madogram — robust first-order form) and Σ Δ_h² (the classical
variogram numerator), all exact BIGINTs. The lag-domain companion to
``evt_autocorrelation``: a variogram that keeps RISING with h says
trend/non-stationarity, a flat one says white noise, and the
madogram/variogram ratio exposes heavy tails the squared form
exaggerates. Geostatistics' workhorse applied to the time axis.

``evt_theil_u2_naive`` — Theil's U2 forecast-skill ratio comparing the
SEASONAL-naive forecast (x_{t−7}, weekly rhythm) against the random-
walk naive (x_{t−1}): U2² = Σ(x_t − x_{t−7})² / Σ(x_t − x_{t−1})²
over days where both references exist. U2 < 1 means the weekly naive
beats the random walk — i.e. the series HAS weekly structure worth a
seasonal model; U2 ≥ 1 says don't bother. Exact integer numerator and
denominator; the display ratio is √(num/den). The model-selection
screen in front of the forecasting family
(``evt_holt_winters_check``, ``evt_walk_forward_mae``).

Scale: one |types|·|days| fold each + lag windows per type.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_MAX_LAG = 5


@register(
    "evt_variogram_lags",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t
      FROM d),
    p AS (
      SELECT a.event_type, b.t - a.t AS h,
             abs(b.x - a.x) AS ad,
             (b.x - a.x) * (b.x - a.x) AS sq
      FROM s a JOIN s b
        ON b.event_type = a.event_type
       AND b.t > a.t AND b.t - a.t <= {_MAX_LAG})
    SELECT event_type, CAST(h AS BIGINT) AS lag_h,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ad) AS BIGINT) AS madogram_sum,
           CAST(sum(sq) AS BIGINT) AS variogram_sum,
           CAST(sum(sq) // (2 * count(*)) AS BIGINT)
             AS semivariance_floor
    FROM p GROUP BY event_type, h
    """,
    description=(
        "empirical variogram/madogram of the daily cent series at "
        "lags 1..5 per type: pair counts, sum|diff| (robust madogram) "
        "and sum diff^2 (classical variogram numerator) as exact "
        "BIGINTs plus the floor-division semivariance (integer cents^2; a "
        "rounded double ratio hit a half-tie divergence at sf0.01 and "
        "a micro-scaled form overflows BIGINT at sf1) - the lag-domain "
        "stationarity/trend diagnostic next to autocorrelation; "
        "|types|*|days|*5 banded pair join, calendar-bounded"
    ),
    tags=("events", "statistics", "series"),
)
def evt_variogram_lags(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    s = d.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    ).localCheckpoint(eager=False)  # both sides of the banded pair join
    a, b = s.alias("a"), s.alias("b")
    p = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.t") > F.col("a.t"))
        & (F.col("b.t") - F.col("a.t") <= _MAX_LAG),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.t") - F.col("a.t")).alias("h"),
        F.abs(F.col("b.x") - F.col("a.x")).alias("ad"),
        ((F.col("b.x") - F.col("a.x")) * (F.col("b.x") - F.col("a.x")))
        .alias("sq"),
    )
    return p.groupBy("event_type", F.col("h").cast("bigint").alias("lag_h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("ad").cast("bigint").alias("madogram_sum"),
        F.sum("sq").cast("bigint").alias("variogram_sum"),
        F.expr("sum(sq) div (2 * count(1))")
        .cast("bigint")
        .alias("semivariance_floor"),
    )


@register(
    "evt_theil_u2_naive",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             lag(x, 1) OVER w AS x1,
             lag(x, 7) OVER w AS x7
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    e AS (
      SELECT event_type,
             (x - x7) * (x - x7) AS seas_sq,
             (x - x1) * (x - x1) AS rw_sq
      FROM s WHERE x1 IS NOT NULL AND x7 IS NOT NULL),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(seas_sq) AS BIGINT) AS seasonal_sq_sum,
             CAST(sum(rw_sq) AS BIGINT) AS rw_sq_sum
      FROM e GROUP BY event_type)
    SELECT event_type, n, seasonal_sq_sum, rw_sq_sum,
           CASE WHEN rw_sq_sum > 0 THEN
             round(sqrt(CAST(seasonal_sq_sum AS DOUBLE) / rw_sq_sum), 6)
           END AS theil_u2,
           CAST(CASE WHEN seasonal_sq_sum < rw_sq_sum THEN 1 ELSE 0 END
                AS BIGINT) AS weekly_structure
    FROM agg
    """,
    description=(
        "Theil's U2 forecast-skill screen per type: seasonal-naive "
        "(x_{t-7}) vs random-walk naive (x_{t-1}) squared-error sums "
        "as exact BIGINTs over the common support, U2 = sqrt(ratio); "
        "U2 < 1 certifies weekly structure worth a seasonal model - "
        "the model-selection gate in front of the forecasting family; "
        "one fold + two lag columns"
    ),
    tags=("events", "statistics", "forecast"),
)
def evt_theil_u2_naive(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    e = s.filter(
        F.col("x1").isNotNull() & F.col("x7").isNotNull()
    ).select(
        "event_type",
        ((F.col("x") - F.col("x7")) * (F.col("x") - F.col("x7"))).alias(
            "seas_sq"
        ),
        ((F.col("x") - F.col("x1")) * (F.col("x") - F.col("x1"))).alias(
            "rw_sq"
        ),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("seas_sq").cast("bigint").alias("seasonal_sq_sum"),
        F.sum("rw_sq").cast("bigint").alias("rw_sq_sum"),
    )
    return agg.select(
        "event_type",
        "n",
        "seasonal_sq_sum",
        "rw_sq_sum",
        F.when(
            F.col("rw_sq_sum") > 0,
            F.round(
                F.sqrt(
                    F.col("seasonal_sq_sum").cast("double")
                    / F.col("rw_sq_sum")
                ),
                6,
            ),
        ).alias("theil_u2"),
        F.when(F.col("seasonal_sq_sum") < F.col("rw_sq_sum"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("weekly_structure"),
    )
