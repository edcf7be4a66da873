"""Round-6 continuation (batch h): standardized rates, model gains,
and inventory classification.

Everything integer-first per the registry contract; the distinctive
moves are exact CROSS-MULTIPLIED class thresholds (`rel_abc_xyz`
compares 4·(nQ−S²) ≤ S² instead of computing a float CV) and
stratum-weighted rate adjustment with k-static left-assoc double sums
(`evt_standardized_rates`).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import cents, keyed_events, t
from .registry import register

#: 6-hour strata (same banding as evt_k_anonymity_audit)
_BANDS = [0, 1, 2, 3]


@register(
    "evt_standardized_rates",
    oracle=r"""
    WITH base AS (
      SELECT event_type,
             CAST(hour(ts) AS INT) // 6 AS band,
             CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS hi
      FROM events WHERE value IS NOT NULL),
    tp AS (
      SELECT event_type,
             CAST(count(*) FILTER (band = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (band = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (band = 2) AS BIGINT) AS n2,
             CAST(count(*) FILTER (band = 3) AS BIGINT) AS n3,
             CAST(coalesce(sum(hi) FILTER (band = 0), 0) AS BIGINT) AS x0,
             CAST(coalesce(sum(hi) FILTER (band = 1), 0) AS BIGINT) AS x1,
             CAST(coalesce(sum(hi) FILTER (band = 2), 0) AS BIGINT) AS x2,
             CAST(coalesce(sum(hi) FILTER (band = 3), 0) AS BIGINT) AS x3
      FROM base GROUP BY event_type),
    g AS (
      SELECT CAST(sum(n0) AS BIGINT) AS gn0, CAST(sum(n1) AS BIGINT) AS gn1,
             CAST(sum(n2) AS BIGINT) AS gn2, CAST(sum(n3) AS BIGINT) AS gn3,
             CAST(sum(x0) AS BIGINT) AS gx0, CAST(sum(x1) AS BIGINT) AS gx1,
             CAST(sum(x2) AS BIGINT) AS gx2, CAST(sum(x3) AS BIGINT) AS gx3,
             CAST(sum(n0 + n1 + n2 + n3) AS BIGINT) AS big_n
      FROM tp),
    per_type AS (
      SELECT event_type,
             n0 + n1 + n2 + n3 AS n,
             x0 + x1 + x2 + x3 AS observed,
             (((CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                * CAST(gn0 AS DOUBLE) / CAST(big_n AS DOUBLE)
              + CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                * CAST(gn1 AS DOUBLE) / CAST(big_n AS DOUBLE))
              + CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                * CAST(gn2 AS DOUBLE) / CAST(big_n AS DOUBLE))
              + CAST(x3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                * CAST(gn3 AS DOUBLE) / CAST(big_n AS DOUBLE))
               AS direct_rate,
             (((CAST(n0 AS DOUBLE) * CAST(gx0 AS DOUBLE)
                / CAST(gn0 AS DOUBLE)
              + CAST(n1 AS DOUBLE) * CAST(gx1 AS DOUBLE)
                / CAST(gn1 AS DOUBLE))
              + CAST(n2 AS DOUBLE) * CAST(gx2 AS DOUBLE)
                / CAST(gn2 AS DOUBLE))
              + CAST(n3 AS DOUBLE) * CAST(gx3 AS DOUBLE)
                / CAST(gn3 AS DOUBLE)) AS expected
      FROM tp, g)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(observed AS BIGINT) AS observed,
           (observed * 10000) // n AS crude_bp,
           direct_rate, expected,
           CAST(observed AS DOUBLE) / expected AS smr
    FROM per_type
    """,
    description="direct and indirect standardization of the high-value "
    "rate per event_type over 6h time-of-day strata: crude rate in "
    "exact basis points, stratum-weighted direct rate and SMR "
    "(observed/expected) via identical expression trees over exact "
    "cell integers",
    tags=("events", "statistics"),
)
def evt_standardized_rates(spark, sf_dir):
    """Fair rate comparison when the mix differs — the epidemiology
    move applied to product analytics.

    A type whose traffic skews to high-value hours looks 'better' on
    the crude rate; direct standardization re-weights each type's
    stratum rates by the GLOBAL stratum mix, and the SMR
    (observed/expected under global stratum rates — indirect
    standardization) answers the converse.  Both adjustments are sums
    over the 4 fixed 6-hour strata.

    Determinism: the 4 strata are STATIC (6-hour bands), so each
    type's cell counts pivot into fixed columns (n0..n3, x0..x3) via
    one conditional aggregation, and both adjustments are explicit
    left-assoc 4-term sums — identical expression trees, never a
    float SUM() whose accumulation order an engine could choose.

    Scale: one fact pass to the type-pivot frame (k rows); the global
    stratum totals are one more row.  Everything after is constant
    work.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.expr("CAST(hour(ts) AS INT) DIV 6").alias("band"),
        F.when(F.col("value_c") >= 5000, 1).otherwise(0).alias("hi"),
    )
    tp = base.groupBy("event_type").agg(
        *[
            F.sum(F.when(F.col("band") == b, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{b}")
            for b in _BANDS
        ],
        *[
            F.sum(F.when(F.col("band") == b, F.col("hi")).otherwise(0))
            .cast("bigint")
            .alias(f"x{b}")
            for b in _BANDS
        ],
    )
    # global stratum totals as windows over the k-row type frame — the
    # fact aggregation is derived ONCE (2 scans -> 1 in the audit)
    wall = Window.partitionBy()
    tpg = tp.select(
        "*",
        *[
            F.sum(f"n{b}").over(wall).cast("bigint").alias(f"gn{b}")
            for b in _BANDS
        ],
        *[
            F.sum(f"x{b}").over(wall).cast("bigint").alias(f"gx{b}")
            for b in _BANDS
        ],
    ).withColumn(
        "big_n",
        F.expr("CAST(gn0 + gn1 + gn2 + gn3 AS BIGINT)"),
    )

    def direct_term(b):
        return (
            F.col(f"x{b}").cast("double")
            / F.col(f"n{b}").cast("double")
            * F.col(f"gn{b}").cast("double")
            / F.col("big_n").cast("double")
        )

    def expected_term(b):
        return (
            F.col(f"n{b}").cast("double")
            * F.col(f"gx{b}").cast("double")
            / F.col(f"gn{b}").cast("double")
        )

    direct = (
        (direct_term(0) + direct_term(1)) + direct_term(2)
    ) + direct_term(3)
    expected = (
        (expected_term(0) + expected_term(1)) + expected_term(2)
    ) + expected_term(3)
    per_type = tpg.select(
        "event_type",
        (F.col("n0") + F.col("n1") + F.col("n2") + F.col("n3"))
        .cast("bigint")
        .alias("n"),
        (F.col("x0") + F.col("x1") + F.col("x2") + F.col("x3"))
        .cast("bigint")
        .alias("observed"),
        direct.alias("direct_rate"),
        expected.alias("expected"),
    )
    return per_type.select(
        "event_type", "n", "observed",
        F.expr("(observed * 10000) DIV n").alias("crude_bp"),
        "direct_rate", "expected",
        (F.col("observed").cast("double") / F.col("expected")).alias("smr"),
    )


@register(
    "evt_gains_table",
    oracle=r"""
    WITH u AS (
      SELECT user_id,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS buyer
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    r AS (
      SELECT buyer,
             row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS nu
      FROM u),
    d AS (
      SELECT buyer, (10 * (rn - 1)) // nu + 1 AS decile
      FROM r),
    per AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(buyer) AS BIGINT) AS buyers
      FROM d GROUP BY decile),
    tot AS (
      SELECT CAST(sum(n_users) AS BIGINT) AS all_users,
             CAST(sum(buyers) AS BIGINT) AS all_buyers
      FROM per)
    SELECT CAST(decile AS BIGINT) AS decile, n_users, buyers,
           CAST(sum(buyers) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_buyers,
           CAST((CAST(sum(buyers) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT)
             * 10000) // all_buyers AS BIGINT) AS capture_bp,
           CAST((buyers * all_users * 10000) // (n_users * all_buyers)
             AS BIGINT) AS lift_bp
    FROM per, tot
    """,
    description="gains/lift table: users ranked by total value into "
    "exact deciles (explicit integer arithmetic over a total order — "
    "no engine ntile-remainder convention is load-bearing), per-decile "
    "buyer capture and lift in exact integer basis points - the "
    "model-eval artifact alongside evt_rank_auc and "
    "evt_calibration_bins",
    tags=("events", "statistics", "mleval"),
)
def evt_gains_table(spark, sf_dir):
    """Cumulative-gains and lift — the campaign-targeting readout.

    'Score' is each user's total value (a stand-in model score, as in
    `evt_rank_auc`); outcome is whether they ever purchased.  Deciles
    are ``(10*(rn-1)) DIV n + 1`` over the row_number of the total
    order (score DESC, user_id) — explicit integer arithmetic pinned
    identically in both engines, because ``ntile`` remainder placement
    is an engine/version convention (the round-8 driver-red proved it
    environment-sensitive).  Both operands are non-negative so Spark's
    truncating ``DIV`` equals DuckDB's flooring ``//``.  Capture
    (cumulative % of all buyers reached by decile d) and lift (decile
    buyer-rate over global rate) are exact integer basis points via
    cross-multiplication — no float rates anywhere.

    Completes the supervised-eval triple: `evt_rank_auc` (ranking),
    `evt_calibration_bins` (calibration), gains table (targeting).

    Scale: one fact pass to the user frame; the ntile window runs over
    the AGGREGATE frame (W7 carve-out, as `evt_cohens_kappa`), and the
    final cumulative window is over 10 rows.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum("value_c"), F.lit(0)).cast("bigint").alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("buyer"),
    )
    wtot = Window.orderBy(F.desc("score"), F.asc("user_id"))
    d = u.select(
        "buyer",
        F.row_number().over(wtot).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nu"),
    ).select(
        "buyer",
        F.expr("(10 * (rn - 1)) DIV nu + 1").alias("decile"),
    )
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("buyer").cast("bigint").alias("buyers"),
    )
    # totals as windows over the 10-row decile frame (single lineage)
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = per.select(
        "*",
        F.sum("n_users").over(wall).cast("bigint").alias("all_users"),
        F.sum("buyers").over(wall).cast("bigint").alias("all_buyers"),
        F.sum("buyers").over(wcum).cast("bigint").alias("cum_buyers"),
    )
    return joined.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_users", "buyers", "cum_buyers",
        F.expr("(cum_buyers * 10000) DIV all_buyers").alias("capture_bp"),
        F.expr(
            "(buyers * all_users * 10000) DIV (n_users * all_buyers)"
        ).alias("lift_bp"),
    )


@register(
    "rel_abc_xyz",
    oracle=r"""
    WITH wk AS (
      SELECT l_partkey AS pk,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             week(l_shipdate) AS wk,
             year(l_shipdate) AS yr
      FROM lineitem),
    wdem AS (
      SELECT pk, yr, wk, CAST(sum(qty) AS BIGINT) AS wq
      FROM wk GROUP BY pk, yr, wk),
    p AS (
      SELECT pk,
             CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(wq) AS BIGINT) AS s,
             sum(CAST(wq AS HUGEINT) * wq) AS q
      FROM wdem GROUP BY pk),
    rev AS (
      SELECT pk, CAST(sum(rev_c) AS BIGINT) AS rev_c FROM wk GROUP BY pk),
    joined AS (
      SELECT p.pk, p.n_weeks, p.s, p.q, rev.rev_c
      FROM p JOIN rev ON rev.pk = p.pk),
    ranked AS (
      SELECT *,
             sum(rev_c) OVER (ORDER BY rev_c DESC, pk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev,
             sum(rev_c) OVER () AS tot_rev
      FROM joined),
    classed AS (
      SELECT CASE WHEN cum_rev * 100 <= tot_rev * 80 THEN 'A'
                  WHEN cum_rev * 100 <= tot_rev * 95 THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN 4 * (n_weeks * q - CAST(s AS HUGEINT) * s)
                       <= CAST(s AS HUGEINT) * s THEN 'X'
                  WHEN n_weeks * q - CAST(s AS HUGEINT) * s
                       <= CAST(s AS HUGEINT) * s THEN 'Y'
                  ELSE 'Z' END AS xyz,
             rev_c
      FROM ranked)
    SELECT abc, xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_c) AS BIGINT) AS revenue_c
    FROM classed GROUP BY abc, xyz
    """,
    description="ABC-XYZ inventory classification: ABC by cumulative "
    "revenue share (80/95 cutoffs, integer cross-multiplied), XYZ by "
    "weekly-demand variability with the CV thresholds evaluated as "
    "exact integer inequalities 4*(nQ-S^2) <= S^2 - no float CV "
    "anywhere; 9-cell matrix with part counts and revenue",
    tags=("relational", "window", "allocation"),
)
def rel_abc_xyz(spark, sf_dir):
    """The planner's 9-box: value concentration × demand stability.

    ABC ranks parts by revenue and cuts at 80%/95% CUMULATIVE share —
    the share comparison is ``cum·100 ≤ tot·80`` (integers), never a
    float division.  XYZ classes each part's weekly-demand coefficient
    of variation, and the thresholds CV ≤ 0.5 / ≤ 1.0 become exact
    integer inequalities on the variance numerator:
    ``CV² = (nQ − S²)/S²``, so X ⇔ ``4(nQ − S²) ≤ S²`` and
    Y ⇔ ``nQ − S² ≤ S²`` (population variance over observed weeks).
    The output is the 9-cell matrix (counts + revenue) every
    inventory-policy deck starts from.

    Scale: one fact pass to (part, week), one to part grain; the
    revenue ranking window runs over the part-grain AGGREGATE frame
    (W7 carve-out).  All classes are integer-exact — engines cannot
    disagree on a boundary part.
    """
    li = t(spark, sf_dir, "lineitem")
    wk = li.select(
        F.col("l_partkey").alias("pk"),
        cents("l_extendedprice").alias("rev_c"),
        F.round("l_quantity").cast("bigint").alias("qty"),
        F.weekofyear("l_shipdate").alias("wk"),
        F.year("l_shipdate").alias("yr"),
    )
    # revenue rides the weekly aggregation so the fact table has ONE
    # lineage (wdem -> part grain), not two parallel aggs
    wdem = wk.groupBy("pk", "yr", "wk").agg(
        F.sum("qty").cast("bigint").alias("wq"),
        F.sum("rev_c").cast("bigint").alias("wrev"),
    )
    dec = "decimal(38,0)"
    joined = wdem.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.sum("wq").cast("bigint").alias("s"),
        F.sum((F.col("wq").cast(dec) * F.col("wq")).cast(dec)).alias("q"),
        F.sum("wrev").cast("bigint").alias("rev_c"),
    )
    wrank = Window.orderBy(F.desc("rev_c"), F.asc("pk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = joined.select(
        "pk", "n_weeks", "s", "q", "rev_c",
        F.sum("rev_c").over(wrank).alias("cum_rev"),
        F.sum("rev_c").over(Window.partitionBy()).alias("tot_rev"),
    )
    var_num = F.col("n_weeks").cast(dec) * F.col("q") - F.col("s").cast(
        dec
    ) * F.col("s")
    s2 = F.col("s").cast(dec) * F.col("s")
    classed = ranked.select(
        F.when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.lit(4).cast(dec) * var_num <= s2, "X")
        .when(var_num <= s2, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "rev_c",
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev_c").cast("bigint").alias("revenue_c"),
    )
