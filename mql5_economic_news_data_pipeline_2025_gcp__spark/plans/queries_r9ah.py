"""Round-9 batch ah: the two-sample decile shift function.

``evt_decile_shift_function`` — the quantile SHIFT FUNCTION between
weekday and weekend daily values per event type: the exact nearest-rank
decile of each sample at i/10, i = 1..9, side by side.  The summary
tests say THAT the distributions differ (`evt_ks_drift` sup-gap,
`evt_wasserstein_1d` area, `evt_energy_distance` metric); the shift
function says WHERE — weekends heavier only in the upper tail reads as
shifts near zero through d5 and growing after d7, which is the
actionable shape for staffing/pricing decisions.

Determinism: weekday parity is epoch-anchored with day ≥ epoch
ENFORCED both sides; decile selection is the cross-multiplied
nearest-rank rule 10·r ≥ i·n over (value, day)-ordered rank windows;
every output is BIGINT (the shift is an integer cent difference).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_EPOCH_DAY = "2024-01-01"


@register(
    "evt_decile_shift_function",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CASE WHEN datediff('day', DATE '{_EPOCH_DAY}',
                                CAST(ts AS DATE)) % 7 IN (5, 6)
                  THEN 1 ELSE 0 END AS we,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events
      WHERE value IS NOT NULL AND CAST(ts AS DATE) >= DATE '{_EPOCH_DAY}'
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, we, x,
             row_number() OVER (PARTITION BY event_type, we
                                ORDER BY x, day) AS rk,
             count(*) OVER (PARTITION BY event_type, we) AS n
      FROM d),
    q AS (
      SELECT event_type, we, dec.i AS decile,
             CAST(min(CASE WHEN 10 * rk >= dec.i * n THEN x END)
                  AS BIGINT) AS q
      FROM r CROSS JOIN (SELECT unnest(range(1, 10)) AS i) dec
      GROUP BY event_type, we, dec.i)
    SELECT a.event_type, CAST(a.decile AS BIGINT) AS decile,
           a.q AS q_weekday, b.q AS q_weekend,
           CAST(b.q - a.q AS BIGINT) AS shift_c
    FROM q a JOIN q b
      ON a.event_type = b.event_type AND a.decile = b.decile
    WHERE a.we = 0 AND b.we = 1
    """,
    description=(
        "two-sample decile shift function per event type: exact "
        "nearest-rank deciles (cross-multiplied 10·r ≥ i·n, "
        "(value, day) tie-break) of the weekday and weekend daily "
        "cent distributions side by side, with the integer shift — "
        "WHERE the distributions differ, not just that they do "
        "(upper-tail-only shifts read as zeros through d5), the "
        "actionable shape behind the KS/Wasserstein/energy summary "
        "numbers. Weekday parity is epoch-anchored with day ≥ epoch "
        "enforced in both engines. Shape: one (type, day) rollup, "
        "rank windows per (type, half), a 9-literal expansion, one "
        "self-join of the ≤2·9-row-per-type decile frame"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_decile_shift_function(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & (F.to_date("ts") >= F.lit(_EPOCH_DAY).cast("date"))
    )
    d = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.when(
            (
                F.datediff(
                    F.to_date("ts"), F.lit(_EPOCH_DAY).cast("date")
                )
                % 7
            ).isin(5, 6),
            1,
        )
        .otherwise(0)
        .alias("we"),
    ).agg(F.sum("value_c").cast("bigint").alias("x"))
    w = Window.partitionBy("event_type", "we")
    r = d.select(
        "event_type",
        "we",
        "x",
        F.row_number().over(w.orderBy("x", "day")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    dec = ev.sparkSession.createDataFrame(
        [(i,) for i in range(1, 10)], "i int"
    )
    q = (
        r.crossJoin(F.broadcast(dec))
        .groupBy("event_type", "we", "i")
        .agg(
            F.min(
                F.when(10 * F.col("rk") >= F.col("i") * F.col("n"),
                       F.col("x"))
            )
            .cast("bigint")
            .alias("q")
        )
        .localCheckpoint()  # ≤2·9 rows/type; feeds both join sides
    )
    a = q.filter(F.col("we") == 0).select(
        "event_type", F.col("i").alias("ia"), F.col("q").alias("q_weekday")
    )
    b = q.filter(F.col("we") == 1).select(
        F.col("event_type").alias("et_b"),
        F.col("i").alias("ib"),
        F.col("q").alias("q_weekend"),
    )
    return (
        a.join(
            F.broadcast(b),
            (a["event_type"] == b["et_b"]) & (a["ia"] == b["ib"]),
        )
        .select(
            "event_type",
            F.col("ia").cast("bigint").alias("decile"),
            "q_weekday",
            "q_weekend",
            (F.col("q_weekend") - F.col("q_weekday"))
            .cast("bigint")
            .alias("shift_c"),
        )
    )
