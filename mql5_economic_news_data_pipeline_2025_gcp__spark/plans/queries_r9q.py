"""Round-9 batch q: variables control charts and curve-length fractal
dimension.

``evt_xbar_r_chart`` — the Shewhart X̄-R chart's exact subgroup table:
per (type, day), the first n = 5 chronological measurements form the
rational subgroup; the emitted per-subgroup sum and range plus the
window-lifted per-type grand totals are everything the chart needs
(X̄̄ = Σsums/5k, R̄ = Σranges/k, limits X̄̄ ± A₂R̄ with the n = 5
constant A₂ = 0.577 applied by the gate).  The VARIABLES-chart
companion to `evt_p_chart` (attributes): p-charts watch defect rates,
X̄-R watches level AND dispersion of a measurement.

``evt_higuchi_fd`` — curve-length sums at lags k = 1..4 per type:
Lₖ = Σ|xᵢ − xᵢ₋ₖ|.  The log-log slope of the normalized lengths is the
Higuchi-style fractal dimension (FD ≈ 2 noise, ≈ 1 smooth trend) — the
roughness gauge next to `evt_rescaled_range`'s Hurst exponent (for
fBm-like series FD + H ≈ 2, a cross-check the gate exercises loosely).

Determinism: subgroup membership is a rank window with the standard
(ts, event_id) tie-breaker; ranges and curve lengths are integer
|differences| of exact cents; the only floats anywhere are assembled
by the gates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_SG_N = 5  # rational subgroup size (A2 = 0.577, D3 = 0, D4 = 2.114)
_FD_KS = (1, 2, 3, 4)


@register(
    "evt_xbar_r_chart",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL),
    sg AS (
      SELECT event_type, day,
             CAST(sum(v) AS BIGINT) AS sg_sum,
             CAST(max(v) - min(v) AS BIGINT) AS sg_range
      FROM s WHERE rn <= {_SG_N}
      GROUP BY event_type, day
      HAVING count(*) = {_SG_N})
    SELECT event_type, day, sg_sum, sg_range,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS k,
           CAST(sum(sg_sum) OVER (PARTITION BY event_type) AS BIGINT)
             AS sum_sums,
           CAST(sum(sg_range) OVER (PARTITION BY event_type) AS BIGINT)
             AS sum_ranges
    FROM sg
    """,
    description=(
        f"Shewhart X̄-R subgroup table per event_type: the first "
        f"{_SG_N} chronological measurements of each day form the "
        "rational subgroup (rank window with the (ts, event_id) "
        "tie-breaker; days with fewer are dropped by the HAVING "
        "gate), emitting the exact subgroup sum and range plus the "
        "window-lifted grand totals — the gate assembles "
        "X̄̄ = Σsums/(5k), R̄ = Σranges/k, the A₂/D₃/D₄ control "
        "limits, and counts out-of-control subgroups on both charts. "
        "The variables-chart (level + dispersion) companion to the "
        "attributes p-chart. Shape: one (type, day) rank window, the "
        "subgroup fold rides its exchange, one type window over the "
        "≤366-row subgroup frame"
    ),
    tags=("events", "statistics", "ops"),
)
def evt_xbar_r_chart(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    # project the day COLUMN before the window so the rank window and
    # the subgroup aggregate share one (type, day) exchange (windowing
    # on the raw to_date(ts) expression defeated the reuse: 3 exchanges
    # measured → 2)
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.col("value_c").alias("v"),
    )
    w_rn = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    s = base.select(
        "event_type",
        "day",
        "v",
        F.row_number().over(w_rn).alias("rn"),
    )
    sg = (
        s.filter(F.col("rn") <= _SG_N)
        .groupBy("event_type", "day")
        .agg(
            F.sum("v").cast("bigint").alias("sg_sum"),
            (F.max("v") - F.min("v")).cast("bigint").alias("sg_range"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == _SG_N)
        .drop("cnt")
    )
    wt = Window.partitionBy("event_type")
    return sg.select(
        "event_type",
        "day",
        "sg_sum",
        "sg_range",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("k"),
        F.sum("sg_sum").over(wt).cast("bigint").alias("sum_sums"),
        F.sum("sg_range").over(wt).cast("bigint").alias("sum_ranges"),
    )


@register(
    "evt_higuchi_fd",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, x,
             {", ".join(
                 f"lag(x, {k}) OVER (PARTITION BY event_type ORDER BY day)"
                 f" AS x{k}" for k in _FD_KS)}
      FROM d)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {", ".join(
               f"CAST(sum(abs(x - x{k})) AS BIGINT) AS s{k}, "
               f"CAST(count(x{k}) AS BIGINT) AS m{k}" for k in _FD_KS)}
    FROM r GROUP BY event_type
    """,
    description=(
        "curve-length sums at lags k = 1..4 per event_type daily "
        "series: Lₖ = Σ|xᵢ − xᵢ₋ₖ| as exact integer cents with the "
        "per-lag term counts (NULL-skipping count(xₖ) — the first k "
        "rows have no lag). The gate normalizes to per-step lengths, "
        "fits the log-log slope, and reads the Higuchi-style fractal "
        "dimension (≈2 noise, ≈1 smooth) — the roughness gauge next "
        "to the rescaled-range Hurst exponent, with the FD + H ≈ 2 "
        "fBm cross-check pinned loosely. Shape: one (type, day) "
        "rollup, four lag columns over ONE type window, the fold "
        "rides the window exchange — a single row of 9 BIGINTs per "
        "type at any input scale"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_higuchi_fd(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in _FD_KS],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for k in _FD_KS:
        aggs.append(
            F.sum(F.abs(F.col("x") - F.col(f"x{k}")))
            .cast("bigint")
            .alias(f"s{k}")
        )
        aggs.append(F.count(f"x{k}").cast("bigint").alias(f"m{k}"))
    return r.groupBy("event_type").agg(*aggs)
