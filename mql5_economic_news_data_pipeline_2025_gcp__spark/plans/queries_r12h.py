"""Round-12h batch: extremal index (runs estimator) and Teager–Kaiser
energy.

``evt_extremal_index`` — the runs estimator of the extremal index θ
per type: exceedances of the exact nearest-rank 90% quantile of the
daily cent totals (the kupiec/christoffersen quantile recipe:
10·rk ≥ 9·n, day-index tie-break) are grouped into CLUSTERS — a new
cluster starts when the gap to the previous exceedance day exceeds the
run length r = 2 — and θ̂ = n_clusters / n_exceedances. θ ≈ 1 means
exceedances arrive independently; θ < 1 means they CLUSTER, and 1/θ
estimates mean cluster size — the extreme-value companion to
``evt_peaks_over_threshold`` (which fits magnitudes) and
``evt_tail_dependence`` (cross-series): this one quantifies temporal
clustering of one series' extremes. Pure integers until the display
ratio.

``evt_teager_energy`` — the Teager–Kaiser energy operator
Ψ_t = x_t² − x_{t−1}·x_{t+1} summed over each type's daily series,
with the count of negative-Ψ days: the instantaneous
amplitude·frequency proxy from speech processing, an exact-integer
companion to the Hjorth parameters (Ψ is a quadratic form of three
consecutive samples — no moments, no square roots). Negative Ψ marks
days where the series bends faster than it swings (transients).

Scale: both one fold to |types|·|days| + lag windows per type.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_RUN_GAP = 2


@register(
    "evt_extremal_index",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             row_number() OVER (PARTITION BY event_type ORDER BY x,
                                day) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    thr AS (
      SELECT event_type, CAST(min(x) AS BIGINT) AS u
      FROM s WHERE 10 * rk >= 9 * n
      GROUP BY event_type),
    exc AS (
      SELECT s.event_type, s.t,
             lag(s.t) OVER (PARTITION BY s.event_type ORDER BY s.t)
               AS prev_t
      FROM s JOIN thr ON thr.event_type = s.event_type
      WHERE s.x >= thr.u),
    cl AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_exceed,
             CAST(sum(CASE WHEN prev_t IS NULL
                            OR t - prev_t > {_RUN_GAP}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters
      FROM exc GROUP BY event_type)
    SELECT c.event_type, t2.u AS threshold_c, c.n_exceed, c.n_clusters,
           round(CAST(c.n_clusters AS DOUBLE) / c.n_exceed, 6)
             AS theta_hat
    FROM cl c JOIN thr t2 ON t2.event_type = c.event_type
    """,
    description=(
        "runs estimator of the extremal index per type: exceedances "
        "of the exact nearest-rank 90% daily quantile, clustered with "
        "run gap 2 (a new cluster when the day-index gap exceeds 2), "
        "theta = clusters/exceedances - theta<1 quantifies temporal "
        "clustering of extremes (1/theta = mean cluster size), the "
        "time-axis companion to peaks-over-threshold magnitudes; "
        "integers until the display ratio"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_extremal_index(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w_day = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        F.row_number().over(w_day).alias("t"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    ).localCheckpoint(eager=False)  # feeds threshold AND exceedance scan
    thr = (
        s.filter(10 * F.col("rk") >= 9 * F.col("n"))
        .groupBy("event_type")
        .agg(F.min("x").cast("bigint").alias("u"))
    )
    exc = (
        s.join(F.broadcast(thr), "event_type")
        .filter(F.col("x") >= F.col("u"))
        .select(
            "event_type",
            "t",
            F.lag("t")
            .over(Window.partitionBy("event_type").orderBy("t"))
            .alias("prev_t"),
        )
    )
    cl = exc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exceed"),
        F.sum(
            F.when(
                F.col("prev_t").isNull()
                | (F.col("t") - F.col("prev_t") > _RUN_GAP),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clusters"),
    )
    return cl.join(F.broadcast(thr), "event_type").select(
        "event_type",
        F.col("u").alias("threshold_c"),
        "n_exceed",
        "n_clusters",
        F.round(
            F.col("n_clusters").cast("double") / F.col("n_exceed"), 6
        ).alias("theta_hat"),
    )


@register(
    "evt_teager_energy",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             lag(x) OVER w AS xm, x,
             lead(x) OVER w AS xp
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    psi AS (
      SELECT event_type, x * x - xm * xp AS psi
      FROM s WHERE xm IS NOT NULL AND xp IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_psi,
           CAST(sum(psi) AS BIGINT) AS teager_sum,
           CAST(sum(CASE WHEN psi < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(max(psi) AS BIGINT) AS psi_max
    FROM psi GROUP BY event_type
    """,
    description=(
        "Teager-Kaiser energy operator per type over the daily cent "
        "series: psi_t = x_t^2 - x_(t-1)*x_(t+1), summed, with the "
        "negative-psi day count (transient marker) and the peak psi - "
        "the amplitude*frequency proxy from speech processing as an "
        "exact-integer quadratic form of three consecutive samples; "
        "one fold + one window next to the Hjorth descriptors"
    ),
    tags=("events", "statistics", "series"),
)
def evt_teager_energy(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        F.lag("x").over(w).alias("xm"),
        "x",
        F.lead("x").over(w).alias("xp"),
    )
    psi = s.filter(
        F.col("xm").isNotNull() & F.col("xp").isNotNull()
    ).select(
        "event_type",
        (F.col("x") * F.col("x") - F.col("xm") * F.col("xp")).alias("psi"),
    )
    return psi.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_psi"),
        F.sum("psi").cast("bigint").alias("teager_sum"),
        F.sum(F.when(F.col("psi") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_negative"),
        F.max("psi").cast("bigint").alias("psi_max"),
    )
