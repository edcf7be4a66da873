"""Round-9 batch u: uniform-price auction clearing and the empirical
copula grid.

``rel_auction_clearing`` — market clearing by cumulative crossing: each
part's lineitems are bids (quantity at a floored unit price), supply is
half the offered quantity, and the clearing price is the lowest
accepted bid in price-descending order.  The marginal bid's partial
allocation uses the SAME cumulative-interval identity as
`rel_fifo_cogs` (alloc = clamp(S − cq_prev, 0, q)) — one window cumsum,
no sequential matching.  Emits both the uniform-price revenue
(S × clearing price) and the pay-as-bid revenue for the mechanism
comparison an auction designer reads.

``evt_empirical_copula`` — the decile-rank joint distribution of daily
purchase vs view values: ranks via the round-9 pinned integer decile
arithmetic (10·(rank−1) DIV n), joint cell counts of the 10×10 grid.
`evt_spearman_view_purchase` reads ONE number off this structure and
`evt_tail_dependence` one corner; the copula grid is the whole
dependence surface, margins exactly uniform by construction (the gate
pins each margin's cell sizes to the decile-arithmetic prediction).

Determinism: unit prices are ep DIV q on non-negative operands; decile
cells are the pinned (10·(r−1)) DIV n form that round 9's parity
hardening standardized (no ntile anywhere); every output is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_PAIR = ("purchase", "view")


@register(
    "rel_auction_clearing",
    oracle="""
    WITH b AS (
      SELECT l_partkey,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               // CAST(round(l_quantity) AS BIGINT) AS u_c,
             l_orderkey, l_linenumber
      FROM lineitem),
    s AS (
      SELECT l_partkey, q, u_c,
             sum(q) OVER (PARTITION BY l_partkey
                          ORDER BY u_c DESC, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cq,
             sum(q) OVER (PARTITION BY l_partkey) AS tq,
             count(*) OVER (PARTITION BY l_partkey) AS n_bids
      FROM b),
    a AS (
      SELECT l_partkey, q, u_c, cq, tq // 2 AS supply, n_bids,
             least(greatest(tq // 2 - (cq - q), 0), q) AS alloc
      FROM s)
    SELECT l_partkey,
           CAST(max(n_bids) AS BIGINT) AS n_bids,
           CAST(max(supply) AS BIGINT) AS supply,
           CAST(min(CASE WHEN alloc > 0 THEN u_c END) AS BIGINT)
             AS clearing_price_c,
           CAST(sum(CASE WHEN alloc > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_winners,
           CAST(sum(alloc) AS BIGINT) AS cleared_q,
           CAST(max(supply) * min(CASE WHEN alloc > 0 THEN u_c END)
                AS BIGINT) AS uniform_revenue_c,
           CAST(sum(u_c * alloc) AS BIGINT) AS payasbid_revenue_c
    FROM a
    GROUP BY l_partkey
    """,
    description=(
        "uniform-price auction clearing per part: lineitems are bids "
        "(q units at u = ep DIV q cents, non-negative ⇒ floored "
        "identically), supply S = half the offered quantity, bids "
        "sorted price-descending with the (orderkey, linenumber) "
        "tie-breaker; the marginal bid's partial fill uses the "
        "cumulative-interval identity alloc = clamp(S − cq_prev, 0, "
        "q) — the same no-fold trick as rel_fifo_cogs. Emits winners, "
        "the clearing price (lowest accepted bid), cleared quantity "
        "(= S), and BOTH uniform-price and pay-as-bid revenues — the "
        "mechanism-design comparison. Shape: one l_partkey exchange "
        "shared by the price-ordered cumsum, the lifted totals, and "
        "the final fold"
    ),
    tags=("relational", "finance", "supplychain"),
)
def rel_auction_clearing(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        "l_partkey",
        F.round("l_quantity").cast("bigint").alias("q"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
            " DIV CAST(round(l_quantity) AS BIGINT)"
        ).alias("u_c"),
        "l_orderkey",
        "l_linenumber",
    )
    wp = Window.partitionBy("l_partkey")
    w_cum = wp.orderBy(
        F.col("u_c").desc(), "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    s = b.select(
        "l_partkey",
        "q",
        "u_c",
        F.sum("q").over(w_cum).alias("cq"),
        F.sum("q").over(wp).alias("tq"),
        F.count(F.lit(1)).over(wp).alias("n_bids"),
    )
    a = s.select(
        "l_partkey",
        "q",
        "u_c",
        "n_bids",
        F.expr("tq DIV 2").alias("supply"),
        F.least(
            F.greatest(
                F.expr("tq DIV 2") - (F.col("cq") - F.col("q")), F.lit(0)
            ),
            F.col("q"),
        ).alias("alloc"),
    )
    won = F.when(F.col("alloc") > 0, F.col("u_c"))
    return a.groupBy("l_partkey").agg(
        F.max("n_bids").cast("bigint").alias("n_bids"),
        F.max("supply").cast("bigint").alias("supply"),
        F.min(won).cast("bigint").alias("clearing_price_c"),
        F.sum(F.when(F.col("alloc") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_winners"),
        F.sum("alloc").cast("bigint").alias("cleared_q"),
        (F.max("supply") * F.min(won)).cast("bigint").alias(
            "uniform_revenue_c"
        ),
        F.sum(F.col("u_c") * F.col("alloc"))
        .cast("bigint")
        .alias("payasbid_revenue_c"),
    )


@register(
    "evt_empirical_copula",
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
    r AS (
      SELECT day, x, y,
             row_number() OVER (ORDER BY x, day) AS rx,
             row_number() OVER (ORDER BY y, day) AS ry,
             count(*) OVER () AS n
      FROM d)
    SELECT CAST((10 * (rx - 1)) // n AS BIGINT) AS u_dec,
           CAST((10 * (ry - 1)) // n AS BIGINT) AS v_dec,
           CAST(count(*) AS BIGINT) AS c,
           CAST(max(n) AS BIGINT) AS n
    FROM r GROUP BY u_dec, v_dec
    """,
    description=(
        "empirical copula on the 10×10 decile grid for daily "
        "(purchase, view) values: ranks with the (value, day) "
        "tie-breaker, cells via the PINNED integer decile arithmetic "
        "(10·(r−1)) DIV n — the round-9 parity-hardening form, no "
        "ntile — and joint cell counts. Margins are exactly uniform "
        "by construction (each decile's size is determined by the "
        "arithmetic; the gate pins them), so every deviation of the "
        "grid from n/100-per-cell IS dependence structure: "
        "Spearman/tail-dependence read one projection each, this is "
        "the whole surface. Shape: one day rollup, two rank windows "
        "over the ≤366-row GLOBAL day frame (documented presentation "
        "seam), one ≤100-row fold"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_empirical_copula(spark, sf_dir):
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
    )
    r = d.select(
        "day",
        F.row_number().over(Window.orderBy("x", "day")).alias("rx"),
        F.row_number().over(Window.orderBy("y", "day")).alias("ry"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return (
        r.select(
            F.expr("(10 * (rx - 1)) DIV n").cast("bigint").alias("u_dec"),
            F.expr("(10 * (ry - 1)) DIV n").cast("bigint").alias("v_dec"),
            "n",
        )
        .groupBy("u_dec", "v_dec")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.max("n").cast("bigint").alias("n"),
        )
    )
