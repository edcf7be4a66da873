"""Round-6 continuation (batch l): median-based group comparison and
quantile-driven stocking.

Both are exact-integer end to end: the global median comes from the
value histogram (median-low — no interpolation, no float), and the
newsvendor quantile is the nearest-rank order statistic evaluated as
an integer cross-multiplied inequality.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_TYPES = ["click", "error", "purchase", "signup", "view"]

_MOOD_CELLS_SQL = ",\n             ".join(
    f"CAST(count(*) FILTER (event_type = '{et}' AND above = 1) AS BIGINT)"
    f" AS a{i + 1},\n"
    f"             CAST(count(*) FILTER (event_type = '{et}') AS BIGINT)"
    f" AS n{i + 1}"
    for i, et in enumerate(_TYPES)
)

_MOOD_CHI_SQL = " + ".join(
    f"(CAST(a{g} AS DOUBLE) - CAST(n{g} AS DOUBLE) * CAST(ta AS DOUBLE)"
    f" / CAST(tn AS DOUBLE))"
    f" * (CAST(a{g} AS DOUBLE) - CAST(n{g} AS DOUBLE) * CAST(ta AS DOUBLE)"
    f" / CAST(tn AS DOUBLE))"
    f" / (CAST(n{g} AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE)"
    f" * (1.0 - CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE)))"
    for g in range(1, 6)
)


@register(
    "evt_mood_median_test",
    oracle=rf"""
    WITH h AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS val,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(round(value * 100) AS BIGINT)),
    med AS (
      SELECT min(val) AS med FROM (
        SELECT val,
               sum(c) OVER (ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               sum(c) OVER () AS n
        FROM h) WHERE 2 * cum >= n),
    base AS (
      SELECT event_type,
             CASE WHEN CAST(round(value * 100) AS BIGINT)
                       > (SELECT med FROM med)
                  THEN 1 ELSE 0 END AS above
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT {_MOOD_CELLS_SQL}
      FROM base),
    s AS (
      SELECT *,
             CAST(a1 + a2 + a3 + a4 + a5 AS BIGINT) AS ta,
             CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS tn
      FROM cells)
    SELECT (SELECT CAST(med AS BIGINT) FROM med) AS median_c,
           tn AS n, ta AS n_above,
           CAST(5 AS BIGINT) AS k_groups,
           ({_MOOD_CHI_SQL}) AS chi2
    FROM s
    """,
    description="Mood's median test across the 5 event types: exact "
    "median-low from the value histogram (no interpolation), "
    "above-median 2xk cells as one conditional aggregation, chi-square "
    "with expected counts from identical expression trees",
    tags=("events", "statistics"),
)
def evt_mood_median_test(spark, sf_dir):
    """Do the k groups share a median? — the coarse, outlier-immune
    sibling of `evt_kruskal_wallis`.

    The grand median is the MEDIAN-LOW order statistic read off the
    value histogram (smallest v with 2·cum ≥ n — an integer, so both
    engines pick the identical element; contrast `evt_runs_test`,
    which interpolates).  Each type's above-median count then forms a
    2×k contingency table tested with the standard chi-square, whose
    expected counts n_g·(ta/tn) come from exact integers via
    k-static left-assoc sums.

    Scale: one histogram aggregation over facts (bounded value
    domain), one cumulative window over the histogram, one more fact
    pass for the 2×k cells (the median is a scalar broadcast).
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    h = ev.groupBy(F.col("value_c").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    med = (
        h.select(
            "val",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wall).alias("n"),
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("val").alias("med"))
    )
    base = ev.crossJoin(F.broadcast(med)).select(
        "event_type",
        F.when(F.col("value_c") > F.col("med"), 1).otherwise(0).alias(
            "above"
        ),
        F.col("med"),
    )
    cells = [F.min("med").cast("bigint").alias("median_c")]
    for i, et in enumerate(_TYPES):
        is_g = F.col("event_type") == et
        cells.append(
            F.sum(F.when(is_g & (F.col("above") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias(f"a{i + 1}")
        )
        cells.append(
            F.sum(F.when(is_g, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{i + 1}")
        )
    c = base.agg(*cells)
    s = c.withColumn(
        "ta",
        F.expr("CAST(a1 + a2 + a3 + a4 + a5 AS BIGINT)"),
    ).withColumn(
        "tn",
        F.expr("CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT)"),
    )
    p = F.col("ta").cast("double") / F.col("tn").cast("double")

    def chi_term(g):
        # identical tree to the oracle: (n*ta)/tn, NOT n*(ta/tn)
        e = (
            F.col(f"n{g}").cast("double") * F.col("ta").cast("double")
        ) / F.col("tn").cast("double")
        d = F.col(f"a{g}").cast("double") - e
        return d * d / (e * (F.lit(1.0) - p))

    chi2 = (
        (((chi_term(1) + chi_term(2)) + chi_term(3)) + chi_term(4))
        + chi_term(5)
    )
    return s.select(
        "median_c",
        F.col("tn").alias("n"),
        F.col("ta").alias("n_above"),
        F.lit(5).cast("bigint").alias("k_groups"),
        chi2.alias("chi2"),
    )


@register(
    "rel_newsvendor_stock",
    oracle=r"""
    WITH wdem AS (
      SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             week(l_shipdate) AS wk,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wq
      FROM lineitem GROUP BY l_partkey, year(l_shipdate),
                             week(l_shipdate)),
    r AS (
      SELECT pk, wq,
             row_number() OVER (PARTITION BY pk ORDER BY wq, yr, wk)
               AS rnk,
             count(*) OVER (PARTITION BY pk) AS nw
      FROM wdem),
    qstar AS (
      SELECT pk, min(wq) AS q_star, min(nw) AS n_weeks
      FROM r WHERE 3 * rnk >= 2 * nw GROUP BY pk),
    mean_d AS (
      SELECT pk, CAST(sum(wq) AS BIGINT) AS tot_d,
             CAST(count(*) AS BIGINT) AS nw
      FROM wdem GROUP BY pk),
    j AS (
      SELECT q.pk, q.q_star, q.n_weeks, m.tot_d
      FROM qstar q JOIN mean_d m ON m.pk = q.pk)
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(q_star) AS BIGINT) AS total_stock_units,
           CAST(sum(tot_d) AS BIGINT) AS total_demand_units,
           CAST(sum(CASE WHEN q_star * n_weeks > tot_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_mean,
           CAST(min(q_star) AS BIGINT) AS min_q,
           CAST(max(q_star) AS BIGINT) AS max_q
    FROM j
    """,
    description="newsvendor stocking levels: per-part optimal weekly "
    "stock = the 2/3 critical-ratio quantile of weekly demand, "
    "evaluated as the exact nearest-rank order statistic via the "
    "integer inequality 3*rank >= 2*n - corpus summary of the "
    "resulting stock plan",
    tags=("relational", "window", "allocation"),
)
def rel_newsvendor_stock(spark, sf_dir):
    """How much to stock when over- and under-stocking cost differently.

    The newsvendor rule: stock the q-quantile of demand at the
    critical ratio cu/(cu+co) — here 2/3 (underage twice as costly as
    overage).  Per part, q* is the NEAREST-RANK order statistic of
    weekly demand: the smallest observed week-demand whose rank
    satisfies ``3·rank ≥ 2·n`` — a pure integer inequality, so both
    engines select the identical element (the same median-low
    discipline as `evt_mood_median_test`, at an arbitrary quantile).

    The output is the stock-plan summary (parts, total units, how many
    parts stock above their mean demand — always a majority at a 2/3
    ratio when demand is right-skewed).

    Scale: one fact pass to (part, week); the rank window partitions
    by part (co-partitioned with both downstream aggs — one shuffle of
    the weekly frame); output is one row.
    """
    li = t(spark, sf_dir, "lineitem")
    wdem = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("yr"),
        F.weekofyear("l_shipdate").alias("wk"),
    ).agg(F.sum(F.round("l_quantity").cast("bigint")).alias("wq"))
    w = Window.partitionBy("pk").orderBy("wq", "yr", "wk")
    wp = Window.partitionBy("pk")
    # per-part totals ride the SAME window pass as the ranks — one
    # lineage for the weekly frame (2 scans -> 1 in the audit)
    r = wdem.select(
        "pk", "wq",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("nw"),
        F.sum("wq").over(wp).alias("tot_d"),
    )
    j = (
        r.filter(3 * F.col("rnk") >= 2 * F.col("nw"))
        .groupBy("pk")
        .agg(
            F.min("wq").alias("q_star"),
            F.min("nw").alias("n_weeks"),
            F.min("tot_d").cast("bigint").alias("tot_d"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("q_star").cast("bigint").alias("total_stock_units"),
        F.sum("tot_d").cast("bigint").alias("total_demand_units"),
        F.sum(
            F.when(
                F.col("q_star") * F.col("n_weeks") > F.col("tot_d"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_above_mean"),
        F.min("q_star").cast("bigint").alias("min_q"),
        F.max("q_star").cast("bigint").alias("max_q"),
    )
