"""Round-9 batch aa: circular statistics and inequality shape.

``evt_rayleigh_hours`` — the Rayleigh uniformity test on the hour-of-
day circle per event type: hours are ANGLES (2πh/24), so "are events
concentrated at some time of day" is a resultant-vector-length
question, not a chi-square one — a peak straddling midnight that
chi-square bins dilute shows up at full strength here
(`evt_gof_weekday`'s circular counterpart).  The trig values are a
24-entry micro-unit LITERAL lattice generated once in Python and
embedded identically in both engines' SQL — sin/cos never execute in
either engine, so the libm-vs-StrictMath last-ulp divergence class is
structurally excluded.

``evt_lorenz_asymmetry`` — the Lorenz asymmetry coefficient's exact
sufficient statistics: Gini (`evt_gini_value`) says HOW MUCH
inequality; LAC = F(μ) + L(μ) says WHERE it sits — below 1 when
driven by many small values, above 1 when by few giants (the classic
ecology/economics companion statistic).  Membership below the mean is
the cross-multiplied integer comparison n·x < Σx (no mean division).

Determinism: both queries emit only BIGINT counts and micro-unit
integer sums; the gates assemble R̄, the Rayleigh z, and the LAC.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_TRIG_U = 1000000
#: literal micro-unit lattice: cos/sin of 2πh/24 — SAME literals in
#: both engines, so no trig executes anywhere in either engine
_COS_U = tuple(
    round(math.cos(2 * math.pi * h / 24) * _TRIG_U) for h in range(24)
)
_SIN_U = tuple(
    round(math.sin(2 * math.pi * h / 24) * _TRIG_U) for h in range(24)
)


@register(
    "evt_rayleigh_hours",
    oracle=f"""
    WITH trig(h, cos_u, sin_u) AS (VALUES {", ".join(
        f"({h}, {c}, {s})"
        for h, (c, s) in enumerate(zip(_COS_U, _SIN_U)))}),
    e AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS h
      FROM events),
    c AS (
      SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY event_type, h)
    SELECT c.event_type,
           CAST(sum(c.c) AS BIGINT) AS n,
           CAST(sum(c.c * t.cos_u) AS BIGINT) AS sum_cos_u,
           CAST(sum(c.c * t.sin_u) AS BIGINT) AS sum_sin_u,
           CAST(max(c.c) AS BIGINT) AS peak_hour_count
    FROM c JOIN trig t ON t.h = c.h
    GROUP BY c.event_type
    """,
    description=(
        "Rayleigh uniformity test on the hour-of-day circle per event "
        "type: per-hour counts weighted by a 24-entry micro-unit "
        "cos/sin LITERAL lattice (generated once in Python, embedded "
        "identically in both engines — no trig ever executes in "
        "either engine, excluding the libm last-ulp divergence "
        "class). Emits n and the integer resultant components; the "
        "gate assembles R̄ = |Σe^{{iθ}}|/n and the Rayleigh statistic "
        "z = n·R̄² with its small-sample p-approximation — the "
        "circular test that sees midnight-straddling peaks chi-square "
        "bins dilute. Shape: one (type, hour) count (≤24 rows/type), "
        "one broadcast literal join, one fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_rayleigh_hours(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    c = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    trig = spark.createDataFrame(
        [(h, int(cu), int(su)) for h, (cu, su) in
         enumerate(zip(_COS_U, _SIN_U))],
        "h bigint, cos_u bigint, sin_u bigint",
    )
    return (
        c.join(F.broadcast(trig), "h")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sum(F.col("c") * F.col("cos_u"))
            .cast("bigint")
            .alias("sum_cos_u"),
            F.sum(F.col("c") * F.col("sin_u"))
            .cast("bigint")
            .alias("sum_sin_u"),
            F.max("c").cast("bigint").alias("peak_hour_count"),
        )
    )


@register(
    "evt_lorenz_asymmetry",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    t AS (
      SELECT event_type, v,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(v) OVER (PARTITION BY event_type) AS sv
      FROM s)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(sv) AS BIGINT) AS sum_v,
           CAST(sum(CASE WHEN n * v < sv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(sum(CASE WHEN n * v < sv THEN v ELSE 0 END) AS BIGINT)
             AS sum_below,
           CAST(sum(CASE WHEN n * v = sv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_at_mean
    FROM t GROUP BY event_type
    """,
    description=(
        "Lorenz asymmetry sufficient statistics per event type: counts "
        "and cent sums of values strictly below the mean, with "
        "below-mean membership decided by the cross-multiplied "
        "integer comparison n·v < Σv (no mean division; exact ties "
        "counted separately). The gate assembles "
        "LAC = F(μ) + L(μ) = n_below/n + sum_below/Σv and reads the "
        "SHAPE of inequality — LAC < 1 means many small values drive "
        "the Gini, LAC > 1 means a few giants do — the companion "
        "number evt_gini_value can't give. Shape: one type window "
        "lift + one fold on the same exchange"
    ),
    tags=("events", "statistics"),
)
def evt_lorenz_asymmetry(spark, sf_dir):
    from pyspark.sql import Window

    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    wt = Window.partitionBy("event_type")
    t_ = ev.select(
        "event_type",
        F.col("value_c").alias("v"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("value_c").over(wt).alias("sv"),
    )
    below = F.col("n") * F.col("v") < F.col("sv")
    at = F.col("n") * F.col("v") == F.col("sv")
    return t_.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("sv").cast("bigint").alias("sum_v"),
        F.sum(F.when(below, 1).otherwise(0)).cast("bigint").alias(
            "n_below"
        ),
        F.sum(F.when(below, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("sum_below"),
        F.sum(F.when(at, 1).otherwise(0)).cast("bigint").alias(
            "n_at_mean"
        ),
    )
