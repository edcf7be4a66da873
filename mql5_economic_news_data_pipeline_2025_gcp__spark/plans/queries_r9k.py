"""Round-9 batch k: burst detection and structural-break testing over
the per-type daily series.

``evt_burst_hysteresis`` — two-threshold (Schmitt-trigger) burst
detection over daily event counts: enter burst when the day's count
clears 1.5× the series mean, leave only when it falls to/below the
mean, and carry the state across in-between days.  The hysteresis is
what separates this from naive thresholding (`evt_peak_detection`'s
point peaks, `evt_activity_islands`' activity runs): a burst survives a
single mid-burst dip, so the emitted episodes are the "sustained
attention" windows a trending-topics / incident-response pipeline acts
on — the practical two-state reading of Kleinberg's burst model.

``evt_chow_test`` — Chow structural-break sufficient statistics: OLS of
daily value on the day index fitted separately to the first and second
half of each series.  The gate assembles the F-statistic
((SSEp−SSE1−SSE2)/k) / ((SSE1+SSE2)/(n−2k)) — does ONE line fit the
whole year, or did the trend change at midyear?  The regression-grade
companion to `evt_changepoint_sse`'s constant-mean splits.

Determinism: thresholds are cross-multiplied integer comparisons
(2·c·n ≥ 3·total — no division); burst state is a fill-forward over
integer signals (the `evt_ffill_bfill` group-count idiom, identical in
both engines); Chow emits BIGINT sufficient statistics only, with Σy²
shipped as the 2²⁰-split three-component sums (y ≥ 0 throughout, so
DIV == //).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: y² split point (y = yh·2²⁰ + yl keeps all three square sums int64)
_S20 = 1048576


@register(
    "evt_burst_hysteresis",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    t AS (
      SELECT event_type, day, c, v,
             sum(c) OVER (PARTITION BY event_type) AS total,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    sig AS (
      SELECT event_type, day, c, v,
             CASE WHEN 2 * c * n >= 3 * total THEN 1
                  WHEN c * n <= total THEN 0
                  ELSE NULL END AS s
      FROM t),
    grp AS (
      SELECT event_type, day, c, v, s,
             sum(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS g
      FROM sig),
    st AS (
      SELECT event_type, day, c, v,
             coalesce(max(s) OVER (PARTITION BY event_type, g), 0)
               AS state
      FROM grp),
    runs AS (
      SELECT event_type, day, c, v, state,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               - row_number() OVER (PARTITION BY event_type, state
                                    ORDER BY day) AS island
      FROM st),
    island_len AS (
      SELECT event_type, island, CAST(count(*) AS BIGINT) AS len
      FROM runs WHERE state = 1 GROUP BY event_type, island),
    eps AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_bursts,
             CAST(max(len) AS BIGINT) AS longest_burst
      FROM island_len GROUP BY event_type),
    base AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(state) AS BIGINT) AS burst_days,
             CAST(sum(CASE WHEN state = 1 THEN v ELSE 0 END) AS BIGINT)
               AS burst_value
      FROM runs GROUP BY event_type)
    SELECT b.event_type, b.n_days, b.burst_days,
           CAST(coalesce(e.n_bursts, 0) AS BIGINT) AS n_bursts,
           CAST(coalesce(e.longest_burst, 0) AS BIGINT) AS longest_burst,
           b.burst_value
    FROM base b LEFT JOIN eps e USING (event_type)
    """,
    description=(
        "two-threshold hysteresis (Schmitt-trigger) burst detection "
        "over per-type daily event counts: enter when 2·c·n ≥ 3·total "
        "(count clears 1.5× the series mean, cross-multiplied — no "
        "division), exit when c·n ≤ total, and CARRY the state through "
        "in-between days via the group-count fill-forward idiom; burst "
        "episodes then fall out of the classic rn-difference islands. "
        "Emits days-in-burst, episode count, longest episode, and the "
        "cent value transacted inside bursts — the sustained-attention "
        "windows point-peak detectors miss. Shape: one (type, day) "
        "rollup, windows over the ≤366-row-per-type DAY frame, two "
        "tiny folds joined back broadcast-small"
    ),
    tags=("events", "timeseries", "drift"),
)
def evt_burst_hysteresis(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.coalesce(F.col("value_c"), F.lit(0)))
        .cast("bigint")
        .alias("v"),
    )
    wt = Window.partitionBy("event_type")
    t = d.select(
        "event_type",
        "day",
        "c",
        "v",
        F.sum("c").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    sig = t.select(
        "event_type",
        "day",
        "c",
        "v",
        F.when(2 * F.col("c") * F.col("n") >= 3 * F.col("total"), 1)
        .when(F.col("c") * F.col("n") <= F.col("total"), 0)
        .alias("s"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = sig.withColumn(
        "g",
        F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).over(w_cum),
    )
    st = grp.select(
        "event_type",
        "day",
        "c",
        "v",
        F.coalesce(
            F.max("s").over(Window.partitionBy("event_type", "g")),
            F.lit(0),
        ).alias("state"),
    ).localCheckpoint()  # ≤366-rows-per-type state frame; feeds BOTH the
    # per-type base fold and the burst-island lineage — without it each
    # consumer re-runs the fact rollup (2 scans / 4 exchanges measured →
    # 1 fact pass, the r8h/r9h shared-frame convention)
    runs = st.withColumn(
        "island",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        )
        - F.row_number().over(
            Window.partitionBy("event_type", "state").orderBy("day")
        ),
    )
    island_len = (
        runs.filter(F.col("state") == 1)
        .groupBy("event_type", "island")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    )
    eps = island_len.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bursts"),
        F.max("len").cast("bigint").alias("longest_burst"),
    )
    base = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("state").cast("bigint").alias("burst_days"),
        F.sum(F.when(F.col("state") == 1, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("burst_value"),
    )
    return base.join(F.broadcast(eps), "event_type", "left").select(
        "event_type",
        "n_days",
        "burst_days",
        F.coalesce("n_bursts", F.lit(0)).cast("bigint").alias("n_bursts"),
        F.coalesce("longest_burst", F.lit(0))
        .cast("bigint")
        .alias("longest_burst"),
        "burst_value",
    )


@register(
    "evt_chow_test",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    seg AS (
      SELECT event_type, t, y,
             CASE WHEN 2 * t <= n THEN 1 ELSE 2 END AS seg,
             y // {_S20} AS yh, y % {_S20} AS yl
      FROM r)
    SELECT event_type, CAST(seg AS BIGINT) AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(t * t) AS BIGINT) AS stt,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(t * y) AS BIGINT) AS sty,
           CAST(sum(yh * yh) AS BIGINT) AS syy2,
           CAST(sum(2 * yh * yl) AS BIGINT) AS syy1,
           CAST(sum(yl * yl) AS BIGINT) AS syy0
    FROM seg GROUP BY event_type, seg
    """,
    description=(
        "Chow structural-break sufficient statistics per event_type: "
        "OLS of daily cent total on the chronological day index, "
        "fitted to each half (split 2·t ≤ n — pure integer "
        "comparison). Emits per (type, half) the exact BIGINT "
        "regression moments n/Σt/Σt²/Σy/Σty with Σy² as the 2²⁰-split "
        "three-component sums (y ≥ 0, so truncating DIV equals "
        "flooring //); the gate assembles per-half and pooled SSE and "
        "the Chow F = ((SSEp−SSE₁−SSE₂)/2)/((SSE₁+SSE₂)/(n−4)) — did "
        "the trend CHANGE midyear, beyond `evt_changepoint_sse`'s "
        "constant-mean answer. Shape: one (type, day) rollup, a rank "
        "window over the DAY frame, one (type, half) fold riding the "
        "window's exchange"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_chow_test(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("y")
    )
    wt = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "y",
        F.row_number().over(wt.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    seg = r.select(
        "event_type",
        "t",
        "y",
        F.when(2 * F.col("t") <= F.col("n"), 1).otherwise(2).alias("seg"),
        F.expr(f"y DIV {_S20}").alias("yh"),
        (F.col("y") % _S20).alias("yl"),
    )
    return seg.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
        F.sum(F.col("yh") * F.col("yh")).cast("bigint").alias("syy2"),
        F.sum(2 * F.col("yh") * F.col("yl")).cast("bigint").alias("syy1"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("syy0"),
    ).select(
        "event_type",
        F.col("seg").cast("bigint").alias("seg"),
        "n",
        "st",
        "stt",
        "sy",
        "sty",
        "syy2",
        "syy1",
        "syy0",
    )
