"""Round-6 continuation (batch j): population estimation and
delete-one resampling.

`evt_jackknife_ratio` introduces the last determinism pattern of the
round: an UNORDERED float SUM over a bounded frame is replaced by an
ORDERED cumulative-window sum (both engines accumulate in the same
ROWS-frame order, so the float result is bit-equal) — usable whenever
the summands live on a calendar/category-bounded frame with a total
order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_capture_recapture",
    oracle=r"""
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN CAST(day(ts) AS INT) <= 7 THEN 1 ELSE 0 END)
               AS w1,
             max(CASE WHEN CAST(day(ts) AS INT) BETWEEN 8 AND 14
                 THEN 1 ELSE 0 END) AS w2
      FROM events GROUP BY user_id),
    c AS (
      SELECT CAST(sum(w1) AS BIGINT) AS n1,
             CAST(sum(w2) AS BIGINT) AS n2,
             CAST(sum(w1 * w2) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n_seen
      FROM flags)
    SELECT n1, n2, m, n_seen,
           CASE WHEN m > 0 THEN (n1 * n2) // m ELSE 0 END
             AS lincoln_petersen,
           (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman,
           CASE WHEN m > 0
                THEN ((n1 + 1) * (n2 + 1) // (m + 1) - 1) - n_seen
                ELSE 0 END AS est_unseen
    FROM c
    """,
    description="capture-recapture population estimate: users 'marked' "
    "in week 1, 'recaptured' in week 2 - exact integer "
    "Lincoln-Petersen and bias-corrected Chapman estimators of the "
    "true population, plus the implied unseen count",
    tags=("events", "statistics"),
)
def evt_capture_recapture(spark, sf_dir):
    """How many users exist that we never saw? — the ecology estimator
    applied to audience sizing (and, at 100 TB, to dedup-rate
    estimation: sample two partitions, intersect fingerprints, and
    Chapman bounds the full-corpus duplicate population without an
    all-pairs pass).

    Week-1 actives are the marked sample (n1), week-2 actives the
    recapture sample (n2), both-week actives the marked recaptures
    (m); under independence N̂ = n1·n2/m (Lincoln-Petersen), with
    Chapman's +1 correction unbiased for small m.  Both estimators
    are integer divisions — no floats anywhere.

    Scale: one fact pass to the user frame, one 4-cell aggregation.
    """
    ev = keyed_events(spark, sf_dir)
    flags = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.dayofmonth("ts") <= 7, 1).otherwise(0)
        ).alias("w1"),
        F.max(
            F.when(F.dayofmonth("ts").between(8, 14), 1).otherwise(0)
        ).alias("w2"),
    )
    c = flags.agg(
        F.sum("w1").cast("bigint").alias("n1"),
        F.sum("w2").cast("bigint").alias("n2"),
        F.sum(F.col("w1") * F.col("w2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_seen"),
    )
    chapman = F.expr("(n1 + 1) * (n2 + 1) DIV (m + 1) - 1")
    return c.select(
        "n1", "n2", "m", "n_seen",
        F.when(F.col("m") > 0, F.expr("(n1 * n2) DIV m"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("lincoln_petersen"),
        chapman.alias("chapman"),
        F.when(F.col("m") > 0, chapman - F.col("n_seen"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("est_unseen"),
    )


@register(
    "evt_jackknife_ratio",
    oracle=r"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    t AS (
      SELECT day, y, x,
             sum(y) OVER () AS sy,
             sum(x) OVER () AS sx,
             count(*) OVER () AS n
      FROM d),
    pv AS (
      SELECT day, n,
             CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r_full,
             CAST(sy - y AS DOUBLE) / CAST(sx - x AS DOUBLE) AS r_loo
      FROM t),
    ord AS (
      SELECT n, r_full, r_loo,
             sum(r_loo) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_loo,
             row_number() OVER (ORDER BY day) AS rn
      FROM pv),
    s AS (SELECT n, r_full, cum_loo / CAST(n AS DOUBLE) AS mean_loo
          FROM ord WHERE rn = n),
    dev AS (
      SELECT p.n, s.r_full, s.mean_loo,
             (p.r_loo - s.mean_loo) * (p.r_loo - s.mean_loo) AS d2,
             p.day
      FROM pv p, s),
    ord2 AS (
      SELECT n, r_full, mean_loo,
             sum(d2) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_d2,
             row_number() OVER (ORDER BY day) AS rn
      FROM dev)
    SELECT CAST(n AS BIGINT) AS n_days, r_full, mean_loo,
           (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE) * cum_d2
             AS jack_var,
           sqrt((CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE) * cum_d2)
             AS jack_se
    FROM ord2 WHERE rn = n
    """,
    description="delete-one-day jackknife variance of the revenue-per-"
    "event ratio: leave-one-out ratios from exact integer totals, and "
    "BOTH float sums (mean of pseudo-values, sum of squared "
    "deviations) accumulated through ORDERED cumulative windows so "
    "the float result is bit-equal across engines",
    tags=("events", "statistics", "timeseries"),
)
def evt_jackknife_ratio(spark, sf_dir):
    """A standard error for a ratio — without a formula for one.

    Revenue-per-event R = Σy/Σx has no exact closed-form variance;
    the delete-one jackknife re-computes R without each day (exact
    integer numerators/denominators via subtraction from the grand
    totals — no per-group rescan) and estimates
    Var = (n−1)/n · Σ(R₍ᵢ₎ − R̄)².  Completes the resampling trio:
    `evt_poisson_bootstrap_ci` (bootstrap), `evt_permutation_test`
    (permutation), jackknife (delete-one).

    Determinism: the two float sums run as CUMULATIVE WINDOW sums in
    day order and read the last row — both engines fold in the same
    sequence, so the doubles are bit-equal.  CAVEAT (measured while
    building `rel_price_index`): this window form is only sequential
    in DuckDB for frames under its segment-tree node size (~64 rows) —
    safe for this month-sized day frame, but larger frames must use
    the sorted-array left fold (`evt_anova_oneway` pattern) instead.

    Scale: one fact pass to the calendar-bounded day frame; three
    windows over ≤|days| rows.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("y"),
        F.count(F.lit(1)).cast("bigint").alias("x"),
    )
    wall = Window.partitionBy()
    t_ = d.select(
        "day", "y", "x",
        F.sum("y").over(wall).alias("sy"),
        F.sum("x").over(wall).alias("sx"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    pv = t_.select(
        "day", "n",
        (F.col("sy").cast("double") / F.col("sx").cast("double")).alias(
            "r_full"
        ),
        (
            (F.col("sy") - F.col("y")).cast("double")
            / (F.col("sx") - F.col("x")).cast("double")
        ).alias("r_loo"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    word = Window.orderBy("day")
    ordd = pv.select(
        "n", "r_full", "r_loo", "day",
        F.sum("r_loo").over(wcum).alias("cum_loo"),
        F.row_number().over(word).alias("rn"),
    )
    s = ordd.filter(F.col("rn") == F.col("n")).select(
        "n", "r_full",
        (F.col("cum_loo") / F.col("n").cast("double")).alias("mean_loo"),
    )
    dev = pv.crossJoin(F.broadcast(s.select("mean_loo"))).select(
        "day", "n", "r_full", "mean_loo",
        (
            (F.col("r_loo") - F.col("mean_loo"))
            * (F.col("r_loo") - F.col("mean_loo"))
        ).alias("d2"),
    )
    ord2 = dev.select(
        "n", "r_full", "mean_loo",
        F.sum("d2").over(wcum).alias("cum_d2"),
        F.row_number().over(word).alias("rn"),
    )
    nd = F.col("n").cast("double")
    jv = (nd - F.lit(1.0)) / nd * F.col("cum_d2")
    return ord2.filter(F.col("rn") == F.col("n")).select(
        F.col("n").cast("bigint").alias("n_days"),
        "r_full", "mean_loo",
        jv.alias("jack_var"),
        F.sqrt(jv).alias("jack_se"),
    )