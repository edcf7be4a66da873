"""Round-6 continuation (batch y): space-time interaction (Knox).

The Knox test asks whether events close in SPACE are also close in
TIME (disease surveillance, fraud rings, coordinated abuse).  The
statistic is a pair count — O(n²) naively — bounded here exactly like
`evt_geo_radius_join`: space closeness is same-10°-cell (grid
equi-join), time closeness is |Δday| ≤ 1 (a 3-value day-offset explode
on one side), so the join never leaves cell×day buckets.  All four
margin counts are exact integers; the expectation X̄ = S·T/P and the
excess ratio are identical trees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_knox_test",
    oracle=r"""
    WITH pt AS (
      SELECT event_id,
             CAST(floor((CAST(('0x' || substring(md5(CAST(user_id AS
                    VARCHAR)), 1, 8)) AS BIGINT) % 180000000 - 90000000)
                  / 10000000.0) AS BIGINT) AS la,
             CAST(floor((CAST(('0x' || substring(md5(CAST(user_id AS
                    VARCHAR)), 9, 8)) AS BIGINT) % 360000000 - 180000000)
                  / 10000000.0) AS BIGINT) AS lo,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d
      FROM events),
    n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM pt),
    close_pairs AS (
      SELECT CAST(count(*) AS BIGINT) AS x_st
      FROM pt a JOIN pt b
        ON a.la = b.la AND a.lo = b.lo
       AND b.d BETWEEN a.d - 1 AND a.d + 1
       AND a.event_id < b.event_id),
    space_pairs AS (
      SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS s_pairs
      FROM (SELECT count(*) AS c FROM pt GROUP BY la, lo)),
    time_pairs AS (
      SELECT CAST(sum(CAST(ca AS HUGEINT) * cb) AS BIGINT)
               + CAST(sum(CAST(ca AS HUGEINT) * (ca - 1) // 2) AS BIGINT)
               AS t_pairs_raw
      FROM (
        SELECT a.c AS ca, coalesce(b.c, 0) AS cb
        FROM (SELECT d, count(*) AS c FROM pt GROUP BY d) a
        LEFT JOIN (SELECT d, count(*) AS c FROM pt GROUP BY d) b
          ON b.d = a.d + 1)),
    tot AS (
      SELECT CAST(n * (n - 1) // 2 AS BIGINT) AS all_pairs FROM n)
    SELECT cp.x_st,
           sp.s_pairs,
           tp.t_pairs_raw AS t_pairs,
           tot.all_pairs,
           CAST(sp.s_pairs AS DOUBLE) * CAST(tp.t_pairs_raw AS DOUBLE)
             / CAST(tot.all_pairs AS DOUBLE) AS expected,
           CAST(cp.x_st AS DOUBLE)
             / (CAST(sp.s_pairs AS DOUBLE)
                * CAST(tp.t_pairs_raw AS DOUBLE)
                / CAST(tot.all_pairs AS DOUBLE)) AS excess_ratio
    FROM close_pairs cp, space_pairs sp, time_pairs tp, tot
    """,
    description="Knox space-time interaction test: pairs close in both "
    "space (same 10-degree cell) and time (within 1 day) counted via a "
    "grid equi-join, exact integer margins (within-cell pairs, "
    "within-1-day pairs, all pairs), expectation S*T/P and excess "
    "ratio via identical trees",
    tags=("events", "spatial", "statistics", "timeseries"),
)
def evt_knox_test(spark, sf_dir):
    """Are nearby events also contemporaneous? — the Knox test, the
    workhorse of outbreak/fraud-ring detection.

    X counts pairs close in BOTH dimensions; under no interaction
    E[X] = S·T / (n choose 2) where S and T are the space-close and
    time-close pair counts (margins).  The close-pair count uses the
    `evt_geo_radius_join` discipline — same-cell equi-join with the
    time bound as a join predicate, never an all-pairs product — and
    S and T come from per-cell / per-day HISTOGRAMS (c·(c−1)/2 and
    adjacent-day cross products), so no second pair join exists at
    all.  Every count is an exact integer; expectation and the excess
    ratio X/E[X] are identical trees.

    Scale: the pair join is Σ_cells (events-per-cell)² over 3 day
    offsets — the bounded-density band-join story; margins are
    bounded histogram math.  Events cluster per user (same cell), so
    at real scale the cell histogram is the skew diagnostic to watch
    (`evt_partition_skew_report`).
    """
    ev = keyed_events(spark, sf_dir)
    h1 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    h2 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 9, 8), 16, 10
    ).cast("bigint")
    pt = ev.select(
        "event_id",
        F.floor((h1 % 180000000 - 90000000) / 10000000.0)
        .cast("bigint")
        .alias("la"),
        F.floor((h2 % 360000000 - 180000000) / 10000000.0)
        .cast("bigint")
        .alias("lo"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    )
    a = pt.alias("a")
    # day-offset explode (r13): the b side emits one row per admissible
    # join day (d−1, d, d+1), so the pair join is a pure EQUI-join on
    # (la, lo, day) and its fan-out is bounded by cell×day density.
    # The previous form equi-joined on (la, lo) alone with the BETWEEN
    # as a post-join predicate — the full per-cell fan-out (~7.7M
    # intermediate pairs at sf0.1) that the docstring promised to
    # avoid. Each qualifying pair still matches exactly ONCE (at the
    # unique offset a.d − b.d), so x_st is unchanged.
    b = pt.select(
        "event_id",
        "la",
        "lo",
        F.explode(
            F.array(F.col("d") - 1, F.col("d"), F.col("d") + 1)
        ).alias("dj"),
    ).alias("b")
    close_pairs = (
        a.join(
            b,
            (F.col("a.la") == F.col("b.la"))
            & (F.col("a.lo") == F.col("b.lo"))
            & (F.col("a.d") == F.col("b.dj"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x_st"))
    )
    cell_hist = pt.groupBy("la", "lo").agg(F.count(F.lit(1)).alias("c"))
    space_pairs = cell_hist.agg(
        F.sum(F.expr("c * (c - 1) DIV 2")).cast("bigint").alias("s_pairs")
    )
    day_hist = pt.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    da = day_hist.alias("da")
    db = day_hist.select(
        (F.col("d") - 1).alias("d"), F.col("c").alias("cb")
    ).alias("db")
    dec = "decimal(38,0)"
    time_pairs = (
        da.join(db, "d", "left")
        .agg(
            (
                F.sum(
                    F.col("c").cast(dec)
                    * F.coalesce(F.col("cb"), F.lit(0))
                ).cast("bigint")
                + F.sum(
                    F.col("c").cast(dec) * (F.col("c") - 1) / 2
                ).cast("bigint")
            ).alias("t_pairs")
        )
    )
    n_tot = pt.agg(F.count(F.lit(1)).cast(dec).alias("n"))
    tot = n_tot.select(
        F.expr("CAST(n * (n - 1) / 2 AS BIGINT)").alias("all_pairs")
    )
    j = (
        close_pairs.crossJoin(space_pairs)
        .crossJoin(time_pairs)
        .crossJoin(tot)
    )
    expected = (
        F.col("s_pairs").cast("double")
        * F.col("t_pairs").cast("double")
        / F.col("all_pairs").cast("double")
    )
    return j.select(
        "x_st", "s_pairs", "t_pairs", "all_pairs",
        expected.alias("expected"),
        (F.col("x_st").cast("double") / expected).alias("excess_ratio"),
    )
