"""Round-9 batch j: nonparametric randomness and complexity tests over
the per-type daily value series.

``evt_turning_points`` — the turning-point test for randomness: count
the strict local maxima/minima of each event_type's daily-total series.
Under i.i.d. randomness T ~ N(2(n−2)/3, (16n−29)/90); the z-score tells
whether the series has too FEW turns (trend/persistence) or too MANY
(negative autocorrelation / oscillation).  The complement to
`evt_runs_test` (signs vs median) and `evt_records_test` (record
counts): turning points see local shape those two are blind to.

``evt_permutation_entropy`` — Bandt–Pompe ordinal-pattern counts of
order 3: each consecutive day triple maps to one of 6 rank patterns
(ties broken by time order, the standard convention); the pattern
histogram's normalized Shannon entropy is the series-complexity readout
(≈1 white noise, ≪1 deterministic/trending) used to gate forecasting
model choice.  Nothing else in the registry carries ordinal-pattern
statistics.

Determinism: both queries emit ONLY BIGINT counts computed from strict
integer comparisons on exact cent sums — the gates assemble the float
z-score / entropy.  Rank arithmetic uses the pairwise-comparison form
(rank = #strictly-smaller + #equal-but-earlier), identical text in both
engines; no division, no logs, no negative DIV operands anywhere.

Reference parity: the reference pipeline's feature-prep stage decides
per-series model routing from trend/seasonality heuristics
(reference TRAIN.py feature engineering); these are the
publication-grade versions of that decision's inputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: day-frame CTE shared by both oracles: per-type daily cent totals and
#: the chronological index (the same shape the Spark side builds).
_DAY_SQL = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    s AS (
      SELECT event_type, x,
             lead(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
             lead(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
      FROM d)
"""


@register(
    "evt_turning_points",
    oracle=_DAY_SQL
    + """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN x1 IS NOT NULL AND x2 IS NOT NULL
                          AND ((x < x1 AND x1 > x2)
                            OR (x > x1 AND x1 < x2))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
           CAST(2 * (count(*) - 2) AS BIGINT) AS mu_num,
           CAST(16 * count(*) - 29 AS BIGINT) AS var_num
    FROM s GROUP BY event_type
    """,
    description=(
        "turning-point randomness test per event_type daily-total "
        "series: a day is a turning point when it is a STRICT local "
        "max or min of its (prev, here, next) triple — counted via "
        "two lead() columns so each interior triple is evaluated "
        "exactly once. Emits n, the turning count T, and the exact "
        "integer numerators of the null moments (μ = 2(n−2)/3, "
        "σ² = (16n−29)/90); the gate assembles z = (T−μ)/σ — too few "
        "turns ⇒ trend, too many ⇒ oscillation. Shape: one "
        "(type, day) rollup (map-side combined), lead windows over "
        "the ≤366-row-per-type DAY frame, one type fold — windows "
        "never touch fact-sized data"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_turning_points(spark, sf_dir):
    d = _day_frame(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    )
    turn = (
        F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
        & (
            ((F.col("x") < F.col("x1")) & (F.col("x1") > F.col("x2")))
            | ((F.col("x") > F.col("x1")) & (F.col("x1") < F.col("x2")))
        )
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(turn, 1).otherwise(0)).cast("bigint").alias("n_turning"),
        (2 * (F.count(F.lit(1)) - 2)).cast("bigint").alias("mu_num"),
        (16 * F.count(F.lit(1)) - 29).cast("bigint").alias("var_num"),
    )


@register(
    "evt_permutation_entropy",
    oracle=_DAY_SQL
    + """
    , r AS (
      SELECT event_type,
             -- Bandt-Pompe rank of each triple element: strictly
             -- smaller values count, equal-but-EARLIER values count
             -- (time-order tie break) -> the 3 ranks are always a
             -- permutation of {0,1,2}
             (CASE WHEN x1 < x  THEN 1 ELSE 0 END
            + CASE WHEN x2 < x  THEN 1 ELSE 0 END) AS r0,
             (CASE WHEN x  <= x1 THEN 1 ELSE 0 END
            + CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS r1,
             (CASE WHEN x  <= x2 THEN 1 ELSE 0 END
            + CASE WHEN x1 <= x2 THEN 1 ELSE 0 END) AS r2
      FROM s WHERE x1 IS NOT NULL AND x2 IS NOT NULL)
    SELECT event_type,
           CAST(100 * r0 + 10 * r1 + r2 AS BIGINT) AS pattern,
           CAST(count(*) AS BIGINT) AS c,
           CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
             AS m
    FROM r GROUP BY event_type, r0, r1, r2
    """,
    description=(
        "order-3 Bandt-Pompe ordinal-pattern histogram per event_type "
        "daily-total series: each consecutive day triple maps to the "
        "permutation that sorts it (ranks via pairwise comparisons — "
        "strictly-smaller plus equal-but-earlier, the standard "
        "time-order tie break), encoded 100·r₀+10·r₁+r₂ (012 = "
        "ascending … 210 = descending). Emits per-pattern counts and "
        "the per-type triple total m; the gate assembles permutation "
        "entropy H = −Σ(c/m)ln(c/m) and its ln6-normalized form — the "
        "complexity gauge (≈1 noise, ≪1 deterministic) that routes "
        "series to naive vs model forecasts. Shape: one (type, day) "
        "rollup, two lead windows on the DAY frame, one ≤6-rows-per-"
        "type fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_permutation_entropy(spark, sf_dir):
    d = _day_frame(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).filter(F.col("x1").isNotNull() & F.col("x2").isNotNull())
    i = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
    r = s.select(
        "event_type",
        (i(F.col("x1") < F.col("x")) + i(F.col("x2") < F.col("x"))).alias(
            "r0"
        ),
        (i(F.col("x") <= F.col("x1")) + i(F.col("x2") < F.col("x1"))).alias(
            "r1"
        ),
        (i(F.col("x") <= F.col("x2")) + i(F.col("x1") <= F.col("x2"))).alias(
            "r2"
        ),
    )
    wt = Window.partitionBy("event_type")
    return (
        r.groupBy("event_type", "r0", "r1", "r2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "event_type",
            (100 * F.col("r0") + 10 * F.col("r1") + F.col("r2"))
            .cast("bigint")
            .alias("pattern"),
            "c",
            F.sum("c").over(wt).cast("bigint").alias("m"),
        )
    )


def _day_frame(spark, sf_dir):
    """Per-(event_type, day) exact cent totals — the shared tiny frame
    both batch-j statistics window over."""
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    return ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
