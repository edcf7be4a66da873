"""Round-6 continuation (batch n): tail risk and lead-lag causality.

`evt_var_cvar` reads both the quantile AND the conditional tail mean
off one per-type value histogram.  `evt_granger_lite` runs closed-form
OLS entirely on exact integer cross-moments (centered S-matrices in
38-digit decimals), so the nested-model F statistic is an identical
expression tree over identical integers — regression without any
iterative solver or float accumulation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_var_cvar",
    oracle=r"""
    WITH h AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS val,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(round(value * 100) AS BIGINT)),
    r AS (
      SELECT event_type, val, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY val
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM h),
    rv AS (
      SELECT event_type, val, c, n,
             min(CASE WHEN 20 * cum >= 19 * n THEN val END)
               OVER (PARTITION BY event_type) AS var95
      FROM r),
    tail AS (
      SELECT event_type,
             CAST(min(n) AS BIGINT) AS n,
             CAST(min(var95) AS BIGINT) AS var95_c,
             CAST(sum(c) AS BIGINT) AS tail_n,
             CAST(sum(val * c) AS BIGINT) AS tail_sum_c
      FROM rv WHERE val >= var95
      GROUP BY event_type)
    SELECT event_type, n, var95_c, tail_n, tail_sum_c,
           CAST(tail_sum_c AS DOUBLE) / CAST(tail_n AS DOUBLE) AS cvar_c
    FROM tail
    """,
    description="historical VaR95 and CVaR (expected shortfall) per "
    "event type: nearest-rank 95th percentile via 20*cum >= 19*n on "
    "the per-type value histogram, conditional tail mean from the "
    "SAME histogram - exact integers until the final division",
    tags=("events", "statistics", "timeseries"),
)
def evt_var_cvar(spark, sf_dir):
    """The risk pair: where does the tail start (VaR), and how bad is
    it once you're in it (CVaR / expected shortfall).

    Both statistics come from ONE per-type value histogram: VaR95 is
    the nearest-rank order statistic (smallest v with 20·cum ≥ 19·n —
    exact integer selection, the same discipline as
    `evt_mood_median_test` and `rel_newsvendor_stock`), and CVaR is
    the mean of the histogram mass at or above it (Σ val·c / Σ c —
    exact integer sums).  CVaR is the coherent one of the two — it
    subadditively aggregates across desks/types — which is why the
    output keeps the integer tail components for downstream pooling.

    Scale: one fact pass to the (type, value) histogram; windows and
    the tail join run on that bounded frame.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    h = ev.groupBy("event_type", F.col("value_c").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtype = Window.partitionBy("event_type")
    r = h.select(
        "event_type", "val", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtype).alias("n"),
    )
    # var95 as a window over the SAME histogram frame — one lineage
    # for the fact table (the join-back form audited 2 scans)
    rv = r.select(
        "event_type", "val", "c", "n",
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("val"))
        )
        .over(wtype)
        .alias("var95"),
    )
    tail = (
        rv.filter(F.col("val") >= F.col("var95"))
        .groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n"),
            F.min("var95").cast("bigint").alias("var95_c"),
            F.sum("c").cast("bigint").alias("tail_n"),
            F.sum(F.col("val") * F.col("c")).cast("bigint").alias(
                "tail_sum_c"
            ),
        )
    )
    return tail.select(
        "event_type", "n", "var95_c", "tail_n", "tail_sum_c",
        (
            F.col("tail_sum_c").cast("double")
            / F.col("tail_n").cast("double")
        ).alias("cvar_c"),
    )


@register(
    "evt_granger_lite",
    oracle=r"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (event_type = 'purchase'), 0) AS BIGINT) AS yv,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (event_type = 'view'), 0) AS BIGINT) AS xv
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    lagged AS (
      SELECT yv AS y,
             lag(yv) OVER (ORDER BY day) AS p1,
             lag(xv) OVER (ORDER BY day) AS p2
      FROM d),
    obs AS (SELECT y, p1, p2 FROM lagged WHERE p1 IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(p1) AS HUGEINT) AS s1,
             CAST(sum(p2) AS HUGEINT) AS s2,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(p1 AS HUGEINT) * p1) AS s11,
             sum(CAST(p2 AS HUGEINT) * p2) AS s22,
             sum(CAST(p1 AS HUGEINT) * p2) AS s12,
             sum(CAST(p1 AS HUGEINT) * y) AS s1y,
             sum(CAST(p2 AS HUGEINT) * y) AS s2y
      FROM obs),
    c AS (
      SELECT n,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
      FROM m),
    fit AS (
      SELECT n, cyy, c11,
             cyy - c1y * c1y / c11 AS sse_r,
             cyy - (c1y * (c1y * c22 - c2y * c12)
                    + c2y * (c2y * c11 - c1y * c12))
                   / (c11 * c22 - c12 * c12) AS sse_u
      FROM c)
    SELECT n AS n_obs, sse_r, sse_u,
           (sse_r - sse_u) * (CAST(n AS DOUBLE) - 3.0) / sse_u AS f_stat
    FROM fit
    """,
    description="Granger-style lead-lag F-test: does yesterday's view "
    "volume improve today's purchase-revenue forecast beyond its own "
    "lag - closed-form OLS on exact integer centered cross-moments "
    "(HUGEINT/decimal38), nested-model F via identical trees, no "
    "iterative solver",
    tags=("events", "statistics", "timeseries"),
)
def evt_granger_lite(spark, sf_dir):
    """Does X lead Y? — the econometric complement to
    `evt_ccf_lead_lag`'s correlations.

    Tests whether lagged VIEW revenue improves the one-step forecast
    of PURCHASE revenue beyond purchase's own lag: restricted model
    ``y_t ~ y_{t-1}`` vs unrestricted ``y_t ~ y_{t-1} + x_{t-1}``,
    F = (SSE_r − SSE_u)(n−3)/SSE_u.  Both OLS fits are CLOSED FORM on
    centered cross-moments ``n·Σab − Σa·Σb`` — exact 38-digit integers
    from one aggregation — with the 2×2 normal equations solved by
    Cramer's rule inside one identical expression tree (scaled by n
    throughout: the common factor cancels in every SSE ratio).  No
    gradient steps, no float accumulation, nothing order-dependent.

    Scale: one fact pass to the calendar-bounded day frame, one lag
    window, one 10-cell moment aggregation.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value_c")
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("yv"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "view", F.col("value_c"))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("xv"),
    )
    w = Window.orderBy("day")
    lagged = d.select(
        F.col("yv").alias("y"),
        F.lag("yv").over(w).alias("p1"),
        F.lag("xv").over(w).alias("p2"),
    )
    obs = lagged.filter(F.col("p1").isNotNull())
    dec = "decimal(38,0)"

    def dsum(expr, name):
        return F.sum(expr.cast(dec)).cast(dec).alias(name)

    m = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("y"), "sy"),
        dsum(F.col("p1"), "s1"),
        dsum(F.col("p2"), "s2"),
        dsum(F.col("y").cast(dec) * F.col("y"), "syy"),
        dsum(F.col("p1").cast(dec) * F.col("p1"), "s11"),
        dsum(F.col("p2").cast(dec) * F.col("p2"), "s22"),
        dsum(F.col("p1").cast(dec) * F.col("p2"), "s12"),
        dsum(F.col("p1").cast(dec) * F.col("y"), "s1y"),
        dsum(F.col("p2").cast(dec) * F.col("y"), "s2y"),
    )
    nd = F.col("n").cast(dec)
    c = m.select(
        "n",
        (nd * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
        (nd * F.col("s11") - F.col("s1") * F.col("s1"))
        .cast("double")
        .alias("c11"),
        (nd * F.col("s22") - F.col("s2") * F.col("s2"))
        .cast("double")
        .alias("c22"),
        (nd * F.col("s12") - F.col("s1") * F.col("s2"))
        .cast("double")
        .alias("c12"),
        (nd * F.col("s1y") - F.col("s1") * F.col("sy"))
        .cast("double")
        .alias("c1y"),
        (nd * F.col("s2y") - F.col("s2") * F.col("sy"))
        .cast("double")
        .alias("c2y"),
    )
    sse_r = F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11")
    sse_u = F.col("cyy") - (
        F.col("c1y")
        * (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12"))
        + F.col("c2y")
        * (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12"))
    ) / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12"))
    fit = c.select(
        "n",
        sse_r.alias("sse_r"),
        sse_u.alias("sse_u"),
    )
    return fit.select(
        F.col("n").alias("n_obs"),
        "sse_r", "sse_u",
        (
            (F.col("sse_r") - F.col("sse_u"))
            * (F.col("n").cast("double") - F.lit(3.0))
            / F.col("sse_u")
        ).alias("f_stat"),
    )
