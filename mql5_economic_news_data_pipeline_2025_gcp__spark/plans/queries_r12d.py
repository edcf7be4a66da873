"""Round-12d batch: risk-adjusted return ratios over the daily series.

``evt_sharpe_sortino`` — per-type Sharpe and Sortino ratios of the
day-over-day changes of the daily cent totals (rf = 0, per-period):
Sharpe = mean/σ_pop reduces to the integer-exact form
S / √(nQ − S²) and Sortino = mean/downside-deviation to
S / √(n·D) with D = Σ min(r, 0)² — in both, an exact BIGINT divided by
the square root of an exact BIGINT, so the doubles are bit-identical
across engines (IEEE-754 sqrt is correctly rounded). The classic
risk-adjusted pair next to ``evt_drawdown`` / ``evt_bollinger_bands``
/ ``evt_rsi`` in the series-analytics family; Sortino ≥ Sharpe
whenever losses are lighter-tailed than the full distribution — the
gate asserts the exact relationship from the replayed integers.

``evt_omega_ratio`` — the Omega ratio at threshold 0 over the same
daily changes: Σ gains / Σ losses, a PURE integer pair (no moments, no
square roots — Omega is the full-distribution ratio that needs no
normality story), plus gain/loss day counts. Emitted as exact
numerator/denominator with the display ratio divided once.

Scale: both are one fact fold to |types|·|days| rows, one lag window
per type, one aggregate — calendar-bounded like every series query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


def _daily_changes_sql() -> str:
    return """
    d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type,
             x - lag(x) OVER (PARTITION BY event_type ORDER BY day) AS r
      FROM d),
    rr AS (SELECT event_type, r FROM r WHERE r IS NOT NULL)
    """


def _daily_changes(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        d.select(
            "event_type", (F.col("x") - F.lag("x").over(w)).alias("r")
        )
        .filter(F.col("r").isNotNull())
    )


@register(
    "evt_sharpe_sortino",
    oracle=f"""
    WITH {_daily_changes_sql()},
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS s,
             CAST(sum(r * r) AS BIGINT) AS q,
             CAST(sum(CASE WHEN r < 0 THEN r * r ELSE 0 END) AS BIGINT)
               AS dsq
      FROM rr GROUP BY event_type)
    SELECT event_type, n, s, q, dsq,
           CASE WHEN n * q - s * s > 0
                THEN round(s / sqrt(CAST(n * q - s * s AS DOUBLE)), 6)
           END AS sharpe,
           CASE WHEN dsq > 0
                THEN round(s / sqrt(CAST(n * dsq AS DOUBLE)), 6)
           END AS sortino
    FROM agg
    """,
    description=(
        "per-type Sharpe and Sortino over day-over-day changes of the "
        "daily cent totals (rf=0): Sharpe = S/sqrt(nQ - S^2), Sortino "
        "= S/sqrt(n*D) with downside D = sum(min(r,0)^2) - exact "
        "BIGINTs divided by correctly-rounded sqrt, bit-identical "
        "doubles both engines; the risk-adjusted pair of the series "
        "family (drawdown/bollinger/rsi)"
    ),
    tags=("events", "statistics", "series"),
)
def evt_sharpe_sortino(spark, sf_dir):
    rr = _daily_changes(spark, sf_dir)
    agg = rr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("q"),
        F.sum(
            F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0)
        )
        .cast("bigint")
        .alias("dsq"),
    )
    disc = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return agg.select(
        "event_type",
        "n",
        "s",
        "q",
        "dsq",
        F.when(
            disc > 0,
            F.round(F.col("s") / F.sqrt(disc.cast("double")), 6),
        ).alias("sharpe"),
        F.when(
            F.col("dsq") > 0,
            F.round(
                F.col("s")
                / F.sqrt((F.col("n") * F.col("dsq")).cast("double")),
                6,
            ),
        ).alias("sortino"),
    )


@register(
    "evt_omega_ratio",
    oracle=f"""
    WITH {_daily_changes_sql()},
    agg AS (
      SELECT event_type,
             CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT)
               AS gain_sum,
             CAST(sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT)
               AS loss_sum,
             CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS gain_days,
             CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS loss_days
      FROM rr GROUP BY event_type)
    SELECT event_type, gain_sum, loss_sum, gain_days, loss_days,
           CASE WHEN loss_sum > 0
                THEN round(CAST(gain_sum AS DOUBLE) / loss_sum, 6)
           END AS omega
    FROM agg
    """,
    description=(
        "Omega ratio at threshold 0 per type over the daily changes: "
        "sum(gains)/sum(losses) as a PURE integer pair (the "
        "full-distribution risk ratio - no moments, no sqrt), with "
        "gain/loss day counts; one fold + one lag window, "
        "calendar-bounded"
    ),
    tags=("events", "statistics", "series"),
)
def evt_omega_ratio(spark, sf_dir):
    rr = _daily_changes(spark, sf_dir)
    agg = rr.groupBy("event_type").agg(
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("gain_sum"),
        F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("loss_sum"),
        F.sum(F.when(F.col("r") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("gain_days"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("loss_days"),
    )
    return agg.select(
        "event_type",
        "gain_sum",
        "loss_sum",
        "gain_days",
        "loss_days",
        F.when(
            F.col("loss_sum") > 0,
            F.round(F.col("gain_sum").cast("double") / F.col("loss_sum"), 6),
        ).alias("omega"),
    )
