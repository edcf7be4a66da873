"""Round-9 batch h: multivariate extremes and credit-scoring feature
diagnostics.

``evt_tail_dependence`` — upper/lower tail-dependence counts between
the daily purchase and view value series: univariate tail tools
(`evt_pot_gpd_tail`, `evt_peaks_over_threshold`) say how heavy each
tail is; this says whether the two series blow up on the SAME days —
the co-movement number a risk model needs beyond correlation (which is
dominated by the bulk, not the tail).

``evt_information_value`` — Weight-of-Evidence / Information Value of
the standing score (per-user total value) against the purchase
outcome, over quintile bins from the pinned integer decile arithmetic:
the credit-scoring feature-strength readout (IV < 0.02 useless,
0.1–0.3 medium, > 0.5 suspicious) next to `evt_mutual_information`'s
nat-denominated dependence.

Determinism: thresholds are exact nearest-rank order statistics via
cross-multiplied histogram cumsums; WOE is micro-nat quantized from an
integer ratio; every emitted column is BIGINT; IV itself is assembled
by the pytest gate from the emitted per-bin integers (its g/G − b/B
weights are the one fractional step).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_LN_U = 1000000
#: the pinned series pair for tail co-movement
_PAIR = ("purchase", "view")


@register(
    "evt_tail_dependence",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = '{_PAIR[0]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = '{_PAIR[1]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    qx AS (
      SELECT min(v) AS u FROM (
        SELECT x AS v,
               row_number() OVER (ORDER BY x, day) AS r,
               count(*) OVER () AS n
        FROM d) WHERE 10 * r >= 9 * n),
    qy AS (
      SELECT min(v) AS u FROM (
        SELECT y AS v,
               row_number() OVER (ORDER BY y, day) AS r,
               count(*) OVER () AS n
        FROM d) WHERE 10 * r >= 9 * n)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(qx.u) AS BIGINT) AS u_x,
           CAST(max(qy.u) AS BIGINT) AS u_y,
           CAST(sum(CASE WHEN d.x >= qx.u THEN 1 ELSE 0 END) AS BIGINT)
             AS n_x_hi,
           CAST(sum(CASE WHEN d.y >= qy.u THEN 1 ELSE 0 END) AS BIGINT)
             AS n_y_hi,
           CAST(sum(CASE WHEN d.x >= qx.u AND d.y >= qy.u
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_both_hi,
           CAST(sum(CASE WHEN d.x >= qx.u AND d.y >= qy.u
                         THEN 1 ELSE 0 END) * 10000
                // greatest(sum(CASE WHEN d.x >= qx.u THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS lambda_u_bp
    FROM d, qx, qy
    """,
    description=(
        "upper tail dependence between the daily purchase and view "
        "value series: per-day cent sums, each series' exact "
        "90th-percentile order statistic (rank window over the "
        "≤|days| frame, cross-multiplied 10·r ≥ 9·n), then the "
        "co-exceedance counts and λ_U = P(Y hi | X hi) in floored "
        "basis points — the do-the-tails-move-together number that "
        "correlation (bulk-dominated) and the univariate POT family "
        "can't give. Shape: one day rollup (map-side combined), two "
        "rank windows over the ~366-row DAY frame, a 1-row fold — "
        "the windows never touch fact-sized data"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_tail_dependence(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == tname, F.col("value_c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias(col)
            for tname, col in zip(_PAIR, ("x", "y"))
        ]
    ).localCheckpoint()  # ≤|days| rows; feeds both q90 lineages + the fold
    # (without it each threshold lineage re-runs the FACT rollup: 3
    # scans / 3 exchanges measured — checkpointing the day frame makes
    # the fact table touched exactly once)

    def q90(col):
        w = Window.orderBy(F.col(col), F.col("day"))
        ranked = d.select(
            F.col(col).alias("v"),
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return ranked.filter(10 * F.col("r") >= 9 * F.col("n")).agg(
            F.min("v").alias("u")
        )

    ux = q90("x").select(F.col("u").alias("u_x"))
    uy = q90("y").select(F.col("u").alias("u_y"))
    j = d.crossJoin(F.broadcast(ux)).crossJoin(F.broadcast(uy))
    xhi = F.when(F.col("x") >= F.col("u_x"), 1).otherwise(0)
    yhi = F.when(F.col("y") >= F.col("u_y"), 1).otherwise(0)
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("u_x").cast("bigint").alias("u_x"),
        F.max("u_y").cast("bigint").alias("u_y"),
        F.sum(xhi).cast("bigint").alias("n_x_hi"),
        F.sum(yhi).cast("bigint").alias("n_y_hi"),
        F.sum(xhi * yhi).cast("bigint").alias("n_both_hi"),
        F.expr(
            "CAST(sum(CASE WHEN x >= u_x AND y >= u_y THEN 1 ELSE 0 END)"
            " * 10000 DIV greatest(sum(CASE WHEN x >= u_x THEN 1 ELSE 0"
            " END), 1) AS BIGINT)"
        ).alias("lambda_u_bp"),
    )


@register(
    "evt_information_value",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0)
                  AS BIGINT) AS wk,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id,
               CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0)
                    AS BIGINT)),
    r AS (
      SELECT y,
             row_number() OVER (ORDER BY score DESC, user_id, wk) AS rn,
             count(*) OVER () AS nu
      FROM u),
    b AS (
      SELECT y, (5 * (rn - 1)) // nu + 1 AS bin FROM r),
    g AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS goods,
             CAST(count(*) - sum(y) AS BIGINT) AS bads
      FROM b GROUP BY bin),
    t AS (
      SELECT bin, n, goods, bads,
             sum(goods) OVER () AS gt, sum(bads) OVER () AS bt
      FROM g)
    SELECT CAST(bin AS BIGINT) AS bin, n, goods, bads,
           CAST(gt AS BIGINT) AS total_goods,
           CAST(bt AS BIGINT) AS total_bads,
           CAST(CASE WHEN goods > 0 AND bads > 0
                     THEN round(ln((CAST(goods AS DOUBLE) * bt)
                                   / (CAST(bads AS DOUBLE) * gt))
                                * {_LN_U})
                     ELSE 0 END AS BIGINT) AS woe_u
    FROM t
    """,
    description=(
        "Weight-of-Evidence table of weekly spend against "
        "converted-that-week, over score QUINTILES from the pinned "
        "integer arithmetic ((5·(rn−1)) DIV n + 1 over (score DESC, "
        "user_id, week) — the round-9 convention, never ntile). The "
        "unit is the (user, week) cell — per-USER labels saturate on "
        "this fixture (every user eventually buys), the weekly frame "
        "keeps both classes populated: per bin the exact "
        "good/bad counts, the global totals window-lifted onto each "
        "row, and WOE = ln(g·B/(b·G)) micro-nat quantized from the "
        "integer ratio (0 sentinel for a degenerate bin — documented, "
        "identical both sides). The pytest gate assembles "
        "IV = Σ(g/G − b/B)·WOE, checks it against the float "
        "reference, and pins the credit-scoring bands. Shape: one "
        "(user, week) aggregate, one rank window over that frame "
        "(the gains_table carve-out), a 5-row fold"
    ),
    tags=("events", "mleval", "statistics"),
)
def evt_information_value(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    wk = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7.0
    ).cast("bigint")
    u = ev.groupBy("user_id", wk.alias("wk")).agg(
        F.coalesce(F.sum("value_c"), F.lit(0)).cast("bigint").alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    wtot = Window.orderBy(F.desc("score"), F.asc("user_id"), F.asc("wk"))
    b = u.select(
        "y",
        F.row_number().over(wtot).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nu"),
    ).select("y", F.expr("(5 * (rn - 1)) DIV nu + 1").alias("bin"))
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("goods"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("bads"),
    )
    wall = Window.partitionBy()
    t_ = g.select(
        "*",
        F.sum("goods").over(wall).alias("gt"),
        F.sum("bads").over(wall).alias("bt"),
    )
    woe = F.when(
        (F.col("goods") > 0) & (F.col("bads") > 0),
        F.round(
            F.log(
                (F.col("goods").cast("double") * F.col("bt"))
                / (F.col("bads").cast("double") * F.col("gt"))
            )
            * _LN_U
        ),
    ).otherwise(F.lit(0))
    return t_.select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        "goods",
        "bads",
        F.col("gt").cast("bigint").alias("total_goods"),
        F.col("bt").cast("bigint").alias("total_bads"),
        woe.cast("bigint").alias("woe_u"),
    )
