"""Round-12e batch: Page's L trend test and Hjorth signal parameters.

``evt_page_trend`` — Page's L test for ORDERED alternatives in a
randomized block design: blocks = days, ordered treatments = the four
six-hour quarters of the day, per-type. Within each day the four
quarter cent-totals are midranked (doubled ranks keep ties integer:
2r = 2·#less + #eq + 2; absent quarters enter as exact 0 totals so
every block is complete), and L = Σ_days Σ_j j·r_dj is emitted in the
doubled form L2 = Σ j·2r — an exact integer — next to its exact null
expectation E[L2] = 50·n_days (k = 4: E per block = (k+1)/2·Σj = 25).
The monotone-daypart-trend member of the rank family: Jonckheere–
Terpstra (``evt_jonckheere_terpstra``) orders GROUPS, Friedman
(``evt_friedman_test``) is the unordered blocks omnibus — Page is the
ordered-blocks version with more power against monotone trends.

``evt_hjorth_parameters`` — Hjorth activity / mobility / complexity of
each type's daily cent series: the three time-domain "signal
descriptors" (variance; √(var(Δx)/var(x)); mobility(Δx)/mobility(x))
that summarize a series with three numbers — the EEG-era ancestors of
spectral features, next to ``evt_haar_energy`` and
``evt_permutation_entropy`` in the signal family. All three variance
numerators are exact BIGINTs (n·Q − S² on the series and its first two
differences); the two ratios are assembled with IDENTICAL double
expression trees (sqrt of a ratio of integer-derived doubles) on both
engines.

Scale: one fact fold each (|types|·|days| and |types|·|days|·4 frames),
lag windows per type — calendar-bounded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_page_trend",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) + 1 AS j,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3),
    grid AS (
      SELECT d.event_type, d.day, js.j, coalesce(q.x, 0) AS x
      FROM (SELECT DISTINCT event_type, day FROM q) d
      CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS j) js
      LEFT JOIN q ON q.event_type = d.event_type AND q.day = d.day
                 AND q.j = js.j),
    rk AS (
      SELECT a.event_type, a.day, a.j,
             2 * sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
               + sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 2 AS twor
      FROM grid a JOIN grid b
        ON b.event_type = a.event_type AND b.day = a.day
       AND b.j <> a.j
      GROUP BY a.event_type, a.day, a.j, a.x)
    SELECT event_type,
           CAST(count(*) / 4 AS BIGINT) AS n_days,
           CAST(sum(j * twor) AS BIGINT) AS l2,
           CAST(50 * (count(*) / 4) AS BIGINT) AS e_l2,
           CAST(sum(j * twor) - 50 * (count(*) / 4) AS BIGINT)
             AS l2_centered
    FROM rk GROUP BY event_type
    """,
    description=(
        "Page's L ordered-alternatives trend test per type: blocks = "
        "days, ordered treatments = four six-hour dayparts, midranked "
        "with doubled integer ranks (2r = 2#less + #eq + 2; absent "
        "quarters enter as exact 0 totals), L2 = sum j*2r next to its "
        "exact null expectation 50*n_days. The ordered-blocks member "
        "of the rank-test family (Jonckheere orders groups, Friedman "
        "is the unordered omnibus); |types|*|days|*4 grid, 4x4 "
        "midranks via an in-block pair join"
    ),
    tags=("events", "statistics", "rank"),
)
def evt_page_trend(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    q = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        ((F.hour("ts") / 6).cast("bigint") + 1).alias("j"),
    ).agg(F.sum("value_c").cast("bigint").alias("x"))
    days = q.select("event_type", "day").distinct()
    js = spark.range(1, 5).select(F.col("id").alias("j"))
    # complete |types|*|days|*4 grid; feeds both sides of the in-block
    # pair join below
    grid = (
        days.crossJoin(F.broadcast(js))
        .join(q, ["event_type", "day", "j"], "left")
        .select(
            "event_type", "day", "j", F.coalesce("x", F.lit(0)).alias("x")
        )
        .localCheckpoint(eager=False)
    )
    a, b = grid.alias("a"), grid.alias("b")
    rk = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.col("a.day"))
            & (F.col("b.j") != F.col("a.j")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.j").alias("j"),
        )
        .agg(
            (
                2 * F.sum(F.when(F.col("b.x") < F.col("a.x"), 1).otherwise(0))
                + F.sum(F.when(F.col("b.x") == F.col("a.x"), 1).otherwise(0))
                + 2
            ).alias("twor")
        )
    )
    return rk.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 4).cast("bigint").alias("n_days"),
        F.sum(F.col("j") * F.col("twor")).cast("bigint").alias("l2"),
        (50 * (F.count(F.lit(1)) / 4)).cast("bigint").alias("e_l2"),
        (
            F.sum(F.col("j") * F.col("twor"))
            - 50 * (F.count(F.lit(1)) / 4)
        )
        .cast("bigint")
        .alias("l2_centered"),
    )


@register(
    "evt_hjorth_parameters",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             x - lag(x) OVER w AS d1,
             x - 2 * lag(x) OVER w + lag(x, 2) OVER w AS d2
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    agg AS (
      SELECT event_type,
             CAST(count(x) AS BIGINT) AS n,
             CAST(count(x) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
               AS v_num,
             CAST(count(d1) AS BIGINT) AS m,
             CAST(count(d1) * sum(d1 * d1) - sum(d1) * sum(d1) AS BIGINT)
               AS vd_num,
             CAST(count(d2) AS BIGINT) AS l,
             CAST(count(d2) * sum(d2 * d2) - sum(d2) * sum(d2) AS BIGINT)
               AS vdd_num
      FROM s GROUP BY event_type)
    SELECT event_type, n, v_num, m, vd_num, l, vdd_num,
           CASE WHEN v_num > 0 AND m > 0 THEN
             round(sqrt((CAST(vd_num AS DOUBLE) * n * n)
                        / (CAST(v_num AS DOUBLE) * m * m)), 6)
           END AS mobility,
           CASE WHEN vd_num > 0 AND l > 0 THEN
             round(sqrt((CAST(vdd_num AS DOUBLE) * m * m)
                        / (CAST(vd_num AS DOUBLE) * l * l))
                   / sqrt((CAST(vd_num AS DOUBLE) * n * n)
                          / (CAST(v_num AS DOUBLE) * m * m)), 6)
           END AS complexity
    FROM agg
    """,
    description=(
        "Hjorth activity/mobility/complexity per type over the daily "
        "cent series: the three time-domain signal descriptors "
        "(variance, sqrt(var(dx)/var(x)), mobility(dx)/mobility(x)). "
        "Population-variance numerators n*Q - S^2 on the series and "
        "its first two lag-window differences are exact BIGINTs; the "
        "two ratios assemble with identical double trees both "
        "engines. Signal family next to Haar energy and permutation "
        "entropy; one fold + one window, calendar-bounded"
    ),
    tags=("events", "statistics", "series"),
)
def evt_hjorth_parameters(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        (F.col("x") - F.lag("x").over(w)).alias("d1"),
        (F.col("x") - 2 * F.lag("x").over(w) + F.lag("x", 2).over(w)).alias(
            "d2"
        ),
    )
    agg = s.groupBy("event_type").agg(
        F.count("x").cast("bigint").alias("n"),
        (F.count("x") * F.sum(F.col("x") * F.col("x"))
         - F.sum("x") * F.sum("x"))
        .cast("bigint")
        .alias("v_num"),
        F.count("d1").cast("bigint").alias("m"),
        (F.count("d1") * F.sum(F.col("d1") * F.col("d1"))
         - F.sum("d1") * F.sum("d1"))
        .cast("bigint")
        .alias("vd_num"),
        F.count("d2").cast("bigint").alias("l"),
        (F.count("d2") * F.sum(F.col("d2") * F.col("d2"))
         - F.sum("d2") * F.sum("d2"))
        .cast("bigint")
        .alias("vdd_num"),
    )
    mob = F.sqrt(
        (F.col("vd_num").cast("double") * F.col("n") * F.col("n"))
        / (F.col("v_num").cast("double") * F.col("m") * F.col("m"))
    )
    mob_d = F.sqrt(
        (F.col("vdd_num").cast("double") * F.col("m") * F.col("m"))
        / (F.col("vd_num").cast("double") * F.col("l") * F.col("l"))
    )
    return agg.select(
        "event_type",
        "n",
        "v_num",
        "m",
        "vd_num",
        "l",
        "vdd_num",
        F.when(
            (F.col("v_num") > 0) & (F.col("m") > 0), F.round(mob, 6)
        ).alias("mobility"),
        F.when(
            (F.col("vd_num") > 0) & (F.col("l") > 0),
            F.round(mob_d / mob, 6),
        ).alias("complexity"),
    )
