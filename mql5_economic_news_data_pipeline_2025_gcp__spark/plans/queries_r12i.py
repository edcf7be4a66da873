"""Round-12i batch: Ulcer index and the Aroon indicator.

``evt_ulcer_index`` — the RMS percentage drawdown of each type's
cumulative daily series: per-day drawdown vs the running peak is
quantized to micro-units (round(1e6·(x − peak)/peak) — one division
per row, identical trees both engines), and the index is
√(Σ dd²/n) — the "pain index" complement to ``evt_drawdown``'s single
worst trough (a series can have a shallow max drawdown but spend every
day under water; Ulcer sees that, max-drawdown doesn't).

``evt_aroon`` — the Aroon up/down indicator (days since the k = 14-day
rolling high/low) via an INTEGER argmax-in-window encoding: pack each
day as (x + 10¹²)·1024 + t (the shift keeps the pack positive, t is
the 1-based day index < 1024), take the rolling max/min of the pack,
and the low 10 bits recover WHICH day held the extreme — latest-day
tie-break for highs falls out of the packing order, and the mirrored
pack (x_shift·1024 + 1023 − t) gives the same tie-break for lows. The
trend-exhaustion member of the TA family next to ``evt_rsi`` and
``evt_bollinger_bands``; emits the latest snapshot per type plus the
new-high day count. No argmax UDF, no self-join — one rolling window.

Scale: both are one fold to |types|·|days| and window passes per type.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_ulcer_index",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    c AS (
      SELECT event_type, day,
             sum(x) OVER w AS cum
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING)),
    p AS (
      SELECT event_type, cum,
             max(cum) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM c),
    dd AS (
      SELECT event_type,
             CAST(round(1000000 * (cum - peak)
                        / CAST(peak AS DOUBLE)) AS BIGINT) AS dd_micro
      FROM p),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dd_micro * dd_micro) AS BIGINT) AS dd_sq_sum,
             CAST(sum(CASE WHEN dd_micro < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS days_under_water
      FROM dd GROUP BY event_type)
    SELECT event_type, n_days, dd_sq_sum, days_under_water,
           round(sqrt(CAST(dd_sq_sum AS DOUBLE) / n_days) / 10000, 6)
             AS ulcer_pct
    FROM agg
    """,
    description=(
        "Ulcer index per type: RMS percentage drawdown of the "
        "cumulative daily series vs its running peak (micro-quantized "
        "per-day drawdowns, exact BIGINT sum of squares, one sqrt at "
        "display) plus days-under-water — the pain-index complement "
        "to evt_drawdown's single worst trough; one fold + cumulative "
        "windows per type"
    ),
    tags=("events", "statistics", "series"),
)
def evt_ulcer_index(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.select("event_type", "day", F.sum("x").over(w).alias("cum"))
    p = c.select(
        "event_type",
        "cum",
        F.max("cum")
        .over(
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("peak"),
    )
    dd = p.select(
        "event_type",
        F.round(
            F.lit(1000000)
            * (F.col("cum") - F.col("peak"))
            / F.col("peak").cast("double")
        )
        .cast("bigint")
        .alias("dd_micro"),
    )
    agg = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("dd_micro") * F.col("dd_micro"))
        .cast("bigint")
        .alias("dd_sq_sum"),
        F.sum(F.when(F.col("dd_micro") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("days_under_water"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "dd_sq_sum",
        "days_under_water",
        F.round(
            F.sqrt(F.col("dd_sq_sum").cast("double") / F.col("n_days"))
            / 10000,
            6,
        ).alias("ulcer_pct"),
    )


@register(
    "evt_aroon",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, day, x,
             row_number() OVER w AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    pk AS (
      SELECT event_type, t, n,
             max((x + 1000000000000) * 1024 + t)
               OVER w13 AS hi_pack,
             min((x + 1000000000000) * 1024 + (1023 - t))
               OVER w13 AS lo_pack
      FROM s WINDOW w13 AS (PARTITION BY event_type ORDER BY t
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
    a AS (
      SELECT event_type, t, n,
             t - hi_pack % 1024 AS since_high,
             t - (1023 - lo_pack % 1024) AS since_low
      FROM pk)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_days,
           CAST(max_by(since_high, t) AS BIGINT) AS last_since_high,
           CAST(max_by(since_low, t) AS BIGINT) AS last_since_low,
           round(100.0 * (14 - max_by(since_high, t)) / 14, 6)
             AS aroon_up,
           round(100.0 * (14 - max_by(since_low, t)) / 14, 6)
             AS aroon_down,
           CAST(sum(CASE WHEN since_high = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_window_highs
    FROM a GROUP BY event_type
    """,
    description=(
        "Aroon up/down per type: days since the 14-day rolling "
        "high/low recovered from an integer pack ((x+1e12)*1024 + t, "
        "rolling max/min, low 10 bits = extreme's day index with "
        "deterministic tie-breaks) - the trend-exhaustion TA "
        "indicator next to RSI and Bollinger, latest snapshot plus "
        "window-high day count; no argmax UDF, no self-join, one "
        "rolling window"
    ),
    tags=("events", "statistics", "series"),
)
def evt_aroon(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "day",
        "x",
        F.row_number().over(w).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    w13 = (
        Window.partitionBy("event_type").orderBy("t").rowsBetween(-13, 0)
    )
    shift = F.col("x") + F.lit(1_000_000_000_000)
    pk = s.select(
        "event_type",
        "t",
        "n",
        F.max(shift * 1024 + F.col("t")).over(w13).alias("hi_pack"),
        F.min(shift * 1024 + (F.lit(1023) - F.col("t")))
        .over(w13)
        .alias("lo_pack"),
    )
    a = pk.select(
        "event_type",
        "t",
        "n",
        (F.col("t") - F.col("hi_pack") % 1024).alias("since_high"),
        (F.col("t") - (F.lit(1023) - F.col("lo_pack") % 1024)).alias(
            "since_low"
        ),
    )
    return a.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max_by("since_high", "t").cast("bigint").alias("last_since_high"),
        F.max_by("since_low", "t").cast("bigint").alias("last_since_low"),
        F.round(
            F.lit(100.0) * (F.lit(14) - F.max_by("since_high", "t")) / 14, 6
        ).alias("aroon_up"),
        F.round(
            F.lit(100.0) * (F.lit(14) - F.max_by("since_low", "t")) / 14, 6
        ).alias("aroon_down"),
        F.sum(F.when(F.col("since_high") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_window_highs"),
    )
