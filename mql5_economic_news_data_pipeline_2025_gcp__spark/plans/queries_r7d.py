"""Round-7 batch d: operational analytics — greedy knapsack selection,
Wilson-bound ranking, DAU/MAU stickiness, and inventory policy (EOQ +
safety stock). The everyday decision queries of a catalog/engagement
warehouse, written with the registry's determinism contract: integer
sufficient statistics first, doubles only as single identical trees,
float-ordered selections tie-broken by key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "rel_knapsack_greedy",
    oracle="""
    WITH p AS (
      SELECT p_brand, p_partkey, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(round(p_retailprice * 100) AS DOUBLE) / p_size AS density
      FROM part WHERE p_size > 0),
    ranked AS (
      SELECT p_brand, p_size, price_c,
             sum(p_size) OVER (PARTITION BY p_brand
                               ORDER BY density DESC, p_partkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_size
      FROM p)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(p_size) AS BIGINT) AS total_size,
           CAST(sum(price_c) AS BIGINT) AS total_value_c
    FROM ranked WHERE cum_size <= 100
    GROUP BY p_brand
    """,
    description=(
        "greedy knapsack per brand: pick parts by value density "
        "(price/size, the classic 2-approximation ordering) until a "
        "100-size-unit shelf budget is full. Density is one identical "
        "division tree (exact-integer cents / int size), ties broken "
        "by partkey, and the capacity check is an integer cumulative "
        "window — no float accumulates. Shape: the sort is over the "
        "PART DIMENSION partitioned by brand (catalog-sized, never "
        "fact-sized; a 100 TB deployment sorts ~millions of catalog "
        "rows per brand bucket, not line items), one window + one fold"
    ),
    tags=("relational", "optimization"),
)
def rel_knapsack_greedy(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_size") > 0)
    price_c = F.round(F.col("p_retailprice") * 100).cast("bigint")
    p = part.select(
        "p_brand",
        "p_partkey",
        "p_size",
        price_c.alias("price_c"),
        (price_c.cast("double") / F.col("p_size")).alias("density"),
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("density").desc(), F.col("p_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = p.select(
        "p_brand", "p_size", "price_c", F.sum("p_size").over(w).alias("cum_size")
    )
    return (
        ranked.filter(F.col("cum_size") <= 100)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("p_size").cast("bigint").alias("total_size"),
            F.sum("price_c").cast("bigint").alias("total_value_c"),
        )
    )


@register(
    "rel_wilson_ranking",
    oracle="""
    WITH s AS (
      SELECT p.p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand),
    wb AS (
      SELECT p_brand, n, pos,
             ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
              + 1.9599639845400545 * 1.9599639845400545
                / (2.0 * CAST(n AS DOUBLE))
              - 1.9599639845400545 * sqrt(
                  ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                   * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                   + 1.9599639845400545 * 1.9599639845400545
                     / (4.0 * CAST(n AS DOUBLE)))
                  / CAST(n AS DOUBLE)))
             / (1.0 + 1.9599639845400545 * 1.9599639845400545
                      / CAST(n AS DOUBLE)) AS wilson_lb
      FROM s)
    SELECT p_brand, n, pos, wilson_lb,
           CAST(row_number() OVER (ORDER BY wilson_lb DESC, p_brand ASC)
                AS BIGINT) AS rnk
    FROM wb
    """,
    description=(
        "Wilson-score lower-bound ranking of per-brand return rates — "
        "the 'how not to sort by average rating' correction: a brand "
        "with 3/4 returns must not outrank one with 60/100. The bound "
        "is one identical expression tree over exact integer (n, pos) "
        "with the z=1.96 quantile written as the same 17-digit literal "
        "both sides (the shared-transcendental-literal recipe), so the "
        "ranking order is bit-identical. Shape: one fact-side "
        "count agg joined to the part dim (broadcast), one 25-row "
        "window"
    ),
    tags=("relational", "statistics", "ranking"),
)
def rel_wilson_ranking(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    s = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("pos"),
        )
    )
    z = F.lit(1.9599639845400545)
    nd = F.col("n").cast("double")
    p = F.col("pos").cast("double") / nd
    lb = (
        p
        + z * z / (F.lit(2.0) * nd)
        - z * F.sqrt((p * (F.lit(1.0) - p) + z * z / (F.lit(4.0) * nd)) / nd)
    ) / (F.lit(1.0) + z * z / nd)
    wb = s.select("p_brand", "n", "pos", lb.alias("wilson_lb"))
    w = Window.orderBy(F.col("wilson_lb").desc(), F.col("p_brand").asc())
    return wb.withColumn("rnk", F.row_number().over(w).cast("bigint"))


@register(
    "evt_dau_mau",
    oracle="""
    WITH d AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS mon,
             CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS mon,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1),
    ds AS (
      SELECT mon, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dau) AS BIGINT) AS sum_dau
      FROM d GROUP BY mon)
    SELECT CAST(ds.mon AS DATE) AS mon, ds.n_days, ds.sum_dau, m.mau,
           CAST(ds.sum_dau AS DOUBLE)
             / (CAST(ds.n_days AS DOUBLE) * CAST(m.mau AS DOUBLE))
             AS stickiness
    FROM ds JOIN m ON m.mon = ds.mon
    """,
    description=(
        "DAU/MAU stickiness per month: mean daily active users over "
        "monthly active users — the canonical engagement-depth ratio "
        "(1.0 = every monthly user active every day). Emitted as "
        "exact integers (active-day count, Σdau, mau) plus the one "
        "identical division tree. Shape: two distinct-count "
        "aggregations at different grains over one scan lineage "
        "(day then month fold; month directly), joined on the "
        "12-row month frame"
    ),
    tags=("events", "engagement"),
)
def evt_dau_mau(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    base = ev.select(
        F.date_trunc("month", F.to_date("ts")).cast("date").alias("mon"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    d = base.groupBy("mon", "day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    ds = d.groupBy("mon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("sum_dau"),
    )
    m = base.groupBy("mon").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    j = ds.join(m, "mon")
    return j.select(
        "mon",
        "n_days",
        "sum_dau",
        "mau",
        (
            F.col("sum_dau").cast("double")
            / (F.col("n_days").cast("double") * F.col("mau").cast("double"))
        ).alias("stickiness"),
    )


@register(
    "rel_inventory_policy",
    oracle="""
    WITH daily AS (
      SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, CAST(l.l_shipdate AS DATE)),
    s AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(d) AS BIGINT) AS sum_d,
             CAST(sum(d * d) AS BIGINT) AS sum_d2
      FROM daily GROUP BY p_brand)
    SELECT p_brand, n_days, sum_d, sum_d2,
           sqrt(2.0 * 100.0 * CAST(sum_d AS DOUBLE) / 2.0) AS eoq,
           (7.0 * CAST(sum_d AS DOUBLE) / CAST(n_days AS DOUBLE))
             + 1.6448536269514722
               * sqrt(7.0
                      * (CAST(n_days AS DOUBLE) * CAST(sum_d2 AS DOUBLE)
                         - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE))
                      / (CAST(n_days AS DOUBLE)
                         * CAST(n_days AS DOUBLE))) AS reorder_point
    FROM s
    """,
    description=(
        "inventory policy per brand from shipped-quantity history: "
        "EOQ = sqrt(2DK/h) with literal ordering cost K=100 and "
        "holding rate h=2 over total demand, and the reorder point = "
        "7-day lead-time demand + z·σ_daily·sqrt(7) safety stock at a "
        "95% service level (z as the shared 17-digit literal). Demand "
        "moments are exact integers (round(quantity) per day: n, ΣD, "
        "ΣD² — population σ via the n-cleared form); both policy "
        "numbers are single identical trees. Shape: one fact agg to "
        "(brand, day), one 25-row moment fold — the same "
        "two-aggregation profile as every daily-demand query"
    ),
    tags=("relational", "operations"),
)
def rel_inventory_policy(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("d")
        )
    )
    s = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("d").cast("bigint").alias("sum_d"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sum_d2"),
    )
    nd = F.col("n_days").cast("double")
    sd = F.col("sum_d").cast("double")
    sd2 = F.col("sum_d2").cast("double")
    z = F.lit(1.6448536269514722)
    eoq = F.sqrt(F.lit(2.0) * F.lit(100.0) * sd / F.lit(2.0))
    rop = (F.lit(7.0) * sd / nd) + z * F.sqrt(
        F.lit(7.0) * (nd * sd2 - sd * sd) / (nd * nd)
    )
    return s.select(
        "p_brand",
        "n_days",
        "sum_d",
        "sum_d2",
        eoq.alias("eoq"),
        rop.alias("reorder_point"),
    )
