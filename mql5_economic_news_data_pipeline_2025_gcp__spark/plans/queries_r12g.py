"""Round-12g batch: Bowker symmetry components and longest streaks.

``evt_bowker_symmetry`` — the K×K generalization of the existing 2×2
``evt_mcnemar_test``: per-user consecutive event-type transitions give
a 5×5 contingency of (prev → next); Bowker's test asks whether it is
SYMMETRIC (flows i→j and j→i balance — a drifting funnel shows up as
asymmetric cells). Emitted per unordered type pair (i < j): both
directed counts, the exact integer χ² component pieces (n_ij − n_ji)²
and n_ij + n_ji, and the display contribution — the engine-portable
decomposition, since the χ² SUM of fractions is not integer-summable
but its per-cell pieces are.

``evt_longest_streaks`` — longest up-run and down-run of the daily
cent changes per type, plus run counts: the gaps-and-islands statistic
behind "N consecutive up days" monitors, complementing
``evt_runs_test`` (which counts runs for randomness) with the EXTREME
run lengths momentum analysis reads. Zero-change days break both kinds
of streak (documented tie rule, identical in both engines). Pure
integer window algebra: sign islands via the rn − rn_by_sign trick.

Scale: both are one fact fold (|users|·|events| transitions /
|types|·|days| dailies) and window work on the folded frame.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_bowker_symmetry",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    tmat AS (
      SELECT prev AS t_from, event_type AS t_to, count(*) AS n
      FROM e WHERE prev IS NOT NULL
      GROUP BY prev, event_type),
    p AS (
      SELECT a.t_from AS type_i, a.t_to AS type_j,
             CAST(a.n AS BIGINT) AS n_ij,
             CAST(coalesce(b.n, 0) AS BIGINT) AS n_ji
      FROM tmat a LEFT JOIN tmat b
        ON b.t_from = a.t_to AND b.t_to = a.t_from
      WHERE a.t_from < a.t_to)
    SELECT type_i, type_j, n_ij, n_ji,
           CAST((n_ij - n_ji) * (n_ij - n_ji) AS BIGINT) AS chi_num,
           CAST(n_ij + n_ji AS BIGINT) AS chi_den,
           CASE WHEN n_ij + n_ji > 0 THEN
             round(CAST((n_ij - n_ji) * (n_ij - n_ji) AS DOUBLE)
                   / (n_ij + n_ji), 6)
           END AS chi_component
    FROM p
    """,
    description=(
        "Bowker symmetry components on the per-user event-type "
        "transition matrix (the KxK generalization of the 2x2 McNemar "
        "query): for each unordered type pair, both directed counts "
        "and the exact integer chi^2 pieces (n_ij - n_ji)^2 and "
        "n_ij + n_ji - asymmetric cells reveal directional funnel "
        "drift. One fact pass, a per-user lag window, a "
        "|types|^2-bounded pair frame"
    ),
    tags=("events", "statistics", "association"),
)
def evt_bowker_symmetry(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    tmat = (
        e.groupBy(
            F.col("prev").alias("t_from"), F.col("event_type").alias("t_to")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # both sides of the mirror join
    )
    a, b = tmat.alias("a"), tmat.alias("b")
    p = (
        a.join(
            F.broadcast(b),
            (F.col("b.t_from") == F.col("a.t_to"))
            & (F.col("b.t_to") == F.col("a.t_from")),
            "left",
        )
        .filter(F.col("a.t_from") < F.col("a.t_to"))
        .select(
            F.col("a.t_from").alias("type_i"),
            F.col("a.t_to").alias("type_j"),
            F.col("a.n").cast("bigint").alias("n_ij"),
            F.coalesce(F.col("b.n"), F.lit(0)).cast("bigint").alias("n_ji"),
        )
    )
    num = (F.col("n_ij") - F.col("n_ji")) * (F.col("n_ij") - F.col("n_ji"))
    den = F.col("n_ij") + F.col("n_ji")
    return p.select(
        "type_i",
        "type_j",
        "n_ij",
        "n_ji",
        num.cast("bigint").alias("chi_num"),
        den.cast("bigint").alias("chi_den"),
        F.when(den > 0, F.round(num.cast("double") / den, 6)).alias(
            "chi_component"
        ),
    )


@register(
    "evt_longest_streaks",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, day,
             CASE WHEN x - lag(x) OVER w > 0 THEN 1
                  WHEN x - lag(x) OVER w < 0 THEN -1
                  ELSE 0 END AS sgn
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    nz AS (
      SELECT event_type, day, sgn,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn,
             row_number() OVER (PARTITION BY event_type, sgn
                                ORDER BY day) AS rs
      FROM r),
    runs AS (
      SELECT event_type, sgn, rn - rs AS grp,
             CAST(count(*) AS BIGINT) AS run_len
      FROM nz WHERE sgn <> 0
      GROUP BY event_type, sgn, rn - rs)
    SELECT event_type,
           CAST(coalesce(max(CASE WHEN sgn = 1 THEN run_len END), 0)
                AS BIGINT) AS longest_up,
           CAST(coalesce(max(CASE WHEN sgn = -1 THEN run_len END), 0)
                AS BIGINT) AS longest_down,
           CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up_runs,
           CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down_runs
    FROM runs GROUP BY event_type
    """,
    description=(
        "longest up-run / down-run of daily cent changes per type plus "
        "run counts - the gaps-and-islands extreme-run statistic "
        "behind 'N consecutive up days' monitors, next to the "
        "runs-count randomness test; zero-change days break both "
        "streak kinds (identical tie rule both engines); pure integer "
        "window algebra (rn - rn_by_sign islands)"
    ),
    tags=("events", "statistics", "series"),
)
def evt_longest_streaks(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "day",
        F.when(F.col("x") - F.lag("x").over(w) > 0, 1)
        .when(F.col("x") - F.lag("x").over(w) < 0, -1)
        .otherwise(0)
        .alias("sgn"),
    )
    # rn is computed over ALL days (zeros included) and rs per sign, so
    # a zero-change day splits the islands on both sides of it — the
    # documented streak-break rule
    nz = r.select(
        "event_type",
        "sgn",
        F.row_number().over(w).alias("rn"),
        F.row_number()
        .over(Window.partitionBy("event_type", "sgn").orderBy("day"))
        .alias("rs"),
    ).filter(F.col("sgn") != 0)
    runs = nz.groupBy(
        "event_type", "sgn", (F.col("rn") - F.col("rs")).alias("grp")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("run_len"))
    return runs.groupBy("event_type").agg(
        F.coalesce(
            F.max(F.when(F.col("sgn") == 1, F.col("run_len"))), F.lit(0)
        )
        .cast("bigint")
        .alias("longest_up"),
        F.coalesce(
            F.max(F.when(F.col("sgn") == -1, F.col("run_len"))), F.lit(0)
        )
        .cast("bigint")
        .alias("longest_down"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up_runs"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down_runs"),
    )
