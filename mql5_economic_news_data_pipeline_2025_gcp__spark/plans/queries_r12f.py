"""Round-12f batch: Christoffersen independence backtest and first-
passage-time distribution.

``evt_christoffersen_test`` — the INDEPENDENCE half of VaR backtesting,
completing ``evt_kupiec_var_backtest`` (which checks the violation
COUNT): Kupiec passes a model whose violations cluster (all in one
crisis week) as long as the total is right; Christoffersen's Markov
test examines the transition counts n00/n01/n10/n11 of the violation
indicator sequence and the conditional violation rates π01 = n01/(n00+
n01) vs π11 = n11/(n10+n11) — clustering shows up as π11 ≫ π01. The
VaR is the SAME exact nearest-rank 10% order statistic of the
chronological first half (the kupiec recipe verbatim: 10·rk ≥ m with
day-index tie-break), transitions are exact integers over the
chronologically-ordered second half, and only the two display rates
divide.

``evt_first_passage_time`` — the distribution of user first-passage
times: the day index (1-based, per-user calendar) on which a user's
cumulative event value first reaches 3 000 dollars, with users that
never cross emitted under the literal bucket −1 (right-censored). The
renewal-analytics primitive behind activation/payback dashboards:
cumulative window per user, one min over crossing days, exact integer
histogram.

Scale: christoffersen folds facts to |types|·|days| rows then runs
rank/lag windows per type. First-passage folds to |users|·|days| rows
(one shuffle), the cumulative window runs per user, and the histogram
is |days|+1 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_FP_THRESHOLD_C = 300_000  # 3000 dollars in cents


@register(
    "evt_christoffersen_test",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, day,
             x - lag(x) OVER (PARTITION BY event_type ORDER BY day) AS dr
      FROM d),
    s AS (
      SELECT event_type, day, dr,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM r WHERE dr IS NOT NULL),
    train AS (
      SELECT event_type, dr,
             row_number() OVER (PARTITION BY event_type ORDER BY dr, t)
               AS rk,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM s WHERE 2 * t <= n),
    var_t AS (
      SELECT event_type, CAST(min(dr) AS BIGINT) AS var_c
      FROM train WHERE 10 * rk >= 1 * m
      GROUP BY event_type),
    test AS (
      SELECT s.event_type,
             CASE WHEN s.dr < v.var_c THEN 1 ELSE 0 END AS viol,
             lag(CASE WHEN s.dr < v.var_c THEN 1 ELSE 0 END)
               OVER (PARTITION BY s.event_type ORDER BY s.day) AS prev
      FROM s JOIN var_t v USING (event_type)
      WHERE 2 * s.t > s.n),
    tr AS (SELECT event_type, prev, viol FROM test WHERE prev IS NOT NULL),
    cnt AS (
      SELECT event_type,
             CAST(sum(CASE WHEN prev = 0 AND viol = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00,
             CAST(sum(CASE WHEN prev = 0 AND viol = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(sum(CASE WHEN prev = 1 AND viol = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(sum(CASE WHEN prev = 1 AND viol = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11
      FROM tr GROUP BY event_type)
    SELECT c.event_type, c.n00, c.n01, c.n10, c.n11, v.var_c,
           CASE WHEN c.n00 + c.n01 > 0 THEN
             round(CAST(c.n01 AS DOUBLE) / (c.n00 + c.n01), 6)
           END AS pi01,
           CASE WHEN c.n10 + c.n11 > 0 THEN
             round(CAST(c.n11 AS DOUBLE) / (c.n10 + c.n11), 6)
           END AS pi11
    FROM cnt c JOIN var_t v USING (event_type)
    """,
    description=(
        "Christoffersen Markov independence backtest per type, the "
        "clustering half VaR validation needs next to Kupiec's count "
        "test: same exact nearest-rank 10% VaR from the chronological "
        "first half, violation-indicator transition counts n00/n01/"
        "n10/n11 over the ordered second half (exact integers), and "
        "the conditional rates pi01 vs pi11 whose gap IS the "
        "clustering signal; one fold + rank/lag windows per type"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_christoffersen_test(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w_day = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type", "day", (F.col("x") - F.lag("x").over(w_day)).alias("dr")
    )
    s = (
        r.filter(F.col("dr").isNotNull())
        .select(
            "event_type",
            "day",
            "dr",
            F.row_number().over(w_day).alias("t"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        # feeds BOTH the train-half rank frame and the test-half lag
        # frame; |types|*|days| rows
        .localCheckpoint(eager=False)
    )
    train = s.filter(2 * F.col("t") <= F.col("n")).select(
        "event_type",
        "dr",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("dr", "t"))
        .alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    var_t = (
        train.filter(10 * F.col("rk") >= F.col("m"))
        .groupBy("event_type")
        .agg(F.min("dr").cast("bigint").alias("var_c"))
    )
    test = (
        s.filter(2 * F.col("t") > F.col("n"))
        .join(F.broadcast(var_t), "event_type")
        .select(
            "event_type",
            "day",
            F.when(F.col("dr") < F.col("var_c"), 1).otherwise(0).alias(
                "viol"
            ),
        )
        .select(
            "event_type",
            "viol",
            F.lag("viol").over(w_day).alias("prev"),
        )
    )
    cnt = (
        test.filter(F.col("prev").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when((F.col("prev") == 0) & (F.col("viol") == 0), 1)
                .otherwise(0)
            ).cast("bigint").alias("n00"),
            F.sum(
                F.when((F.col("prev") == 0) & (F.col("viol") == 1), 1)
                .otherwise(0)
            ).cast("bigint").alias("n01"),
            F.sum(
                F.when((F.col("prev") == 1) & (F.col("viol") == 0), 1)
                .otherwise(0)
            ).cast("bigint").alias("n10"),
            F.sum(
                F.when((F.col("prev") == 1) & (F.col("viol") == 1), 1)
                .otherwise(0)
            ).cast("bigint").alias("n11"),
        )
    )
    return cnt.join(F.broadcast(var_t), "event_type").select(
        "event_type",
        "n00",
        "n01",
        "n10",
        "n11",
        "var_c",
        F.when(
            F.col("n00") + F.col("n01") > 0,
            F.round(
                F.col("n01").cast("double") / (F.col("n00") + F.col("n01")),
                6,
            ),
        ).alias("pi01"),
        F.when(
            F.col("n10") + F.col("n11") > 0,
            F.round(
                F.col("n11").cast("double") / (F.col("n10") + F.col("n11")),
                6,
            ),
        ).alias("pi11"),
    )


@register(
    "evt_first_passage_time",
    oracle=f"""
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    c AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS di,
             sum(x) OVER (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM ud),
    fp AS (
      SELECT user_id,
             min(CASE WHEN cum >= {_FP_THRESHOLD_C} THEN di END)
               AS passage
      FROM c GROUP BY user_id)
    SELECT CAST(coalesce(passage, -1) AS BIGINT) AS passage_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM fp GROUP BY coalesce(passage, -1)
    """,
    description=(
        "first-passage-time distribution: the per-user day index "
        "(1-based user calendar) at which cumulative event value "
        "first reaches $3000, right-censored users under the literal "
        "-1 bucket — the renewal/activation primitive behind payback "
        "dashboards. One fold to |users|*|days| rows, a cumulative "
        "window per user, a |days|+1-row histogram; exact integers "
        "throughout"
    ),
    tags=("events", "statistics", "lifecycle"),
)
def evt_first_passage_time(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    ud = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    c = ud.select(
        "user_id",
        F.row_number().over(w).alias("di"),
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    fp = c.groupBy("user_id").agg(
        F.min(
            F.when(F.col("cum") >= _FP_THRESHOLD_C, F.col("di"))
        ).alias("passage")
    )
    return (
        fp.groupBy(
            F.coalesce(F.col("passage"), F.lit(-1))
            .cast("bigint")
            .alias("passage_days")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
