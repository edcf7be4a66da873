"""Round-11b batch: ordinal association — Hoeffding's D, Goodman–
Kruskal gamma, Somers' D.

``evt_hoeffding_d`` — Hoeffding's D (1948) between each type's daily
cent total and daily event count: the RANK-based independence test
that detects NON-monotone dependence (U-shapes, bands) which Pearson
(`evt_correlation_matrix`), Spearman (`evt_spearman_view_purchase`)
and Kendall (`evt_kendall_tau_matrix`) all read as zero. Ranks R, S
and the bivariate dominance counts Q (strictly-smaller-in-both) are
permutation-exact under composite (value, day) tie-break orders; the
registry row carries the integer sums A = Σ(R−1)(R−2)(S−1)(S−2),
B = Σ(R−2)(S−2)Q, C = ΣQ(Q−1); the gate assembles
D = (A − 2(n−2)B + (n−2)(n−3)C) / (n(n−1)(n−2)(n−3)(n−4)). The
dominance pair frame is |types|·|days|² — calendar-bounded at any
event volume (the evt_knox_test / rel_nation_portfolio_overlap
bounded-self-join discipline).

``rel_goodman_kruskal_gamma`` — gamma between order priority (ordinal
1–5) and order size (line-item count, capped at 7) per order year:
concordant/discordant pair counts computed from the ≤5×7 contingency
GRID, never from row pairs — Σ n_a·n_b over strictly-ordered cell
pairs is exact integer arithmetic on an aggregate that is bounded at
any scale factor.

``evt_somers_d`` — the asymmetric refinement d_yx for
weekday → spend-quintile per event type, from the same grid algebra
plus the full tie decomposition (T_x, T_y, T_xy), with the gate
checking C + D + T_x + T_y + T_xy = N(N−1)/2 exactly and assembling
d_yx = (C−D)/(C+D+T_y). Quintiles are nearest-rank integer buckets
((rank−1)·5 div n), tie-broken by event_id — identical in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_EPOCH_DAY = "2024-01-01"


@register(
    "evt_hoeffding_d",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS tot_c,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    rk AS (
      SELECT event_type, day,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY tot_c, day) AS r,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt, day) AS s
      FROM d),
    q AS (
      SELECT a.event_type, a.r, a.s,
             sum(CASE WHEN b.r < a.r AND b.s < a.s THEN 1 ELSE 0 END) AS qi
      FROM rk a JOIN rk b ON b.event_type = a.event_type
      GROUP BY a.event_type, a.r, a.s)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum((r-1)*(r-2)*(s-1)*(s-2)) AS BIGINT) AS a_sum,
           CAST(sum((r-2)*(s-2)*qi) AS BIGINT) AS b_sum,
           CAST(sum(qi*(qi-1)) AS BIGINT) AS c_sum
    FROM q GROUP BY event_type
    """,
    description=(
        "Hoeffding's D independence statistic per event type between "
        "daily cent totals and daily event counts: exact integer sums "
        "A, B, C over composite-tie-broken ranks and strict bivariate "
        "dominance counts (gate assembles D and pins its [−0.5, 1] "
        "range after ×30 scaling) — the non-monotone-dependence lens "
        "next to the Pearson/Spearman/Kendall monotone family. "
        "Shape: one (type, day) rollup, two rank windows on one "
        "type exchange, a type-bucketed self-join bounded by "
        "|days|² per type at any volume"
    ),
    tags=("events", "statistics", "correlation"),
)
def evt_hoeffding_d(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("tot_c"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    byt = Window.partitionBy("event_type")
    rk = d.select(
        "event_type",
        F.row_number().over(byt.orderBy("tot_c", "day")).alias("r"),
        F.row_number().over(byt.orderBy("cnt", "day")).alias("s"),
    # |types|·|days| rows feeding both self-join sides: cut the
    # rollup+window lineage once instead of re-running it per side
    ).localCheckpoint()
    a = rk.select("event_type", "r", "s")
    b = rk.select(
        F.col("event_type").alias("bt"),
        F.col("r").alias("br"),
        F.col("s").alias("bs"),
    )
    q = (
        a.join(b, F.col("bt") == F.col("event_type"))
        .groupBy("event_type", "r", "s")
        .agg(
            F.sum(
                F.when(
                    (F.col("br") < F.col("r")) & (F.col("bs") < F.col("s")),
                    1,
                ).otherwise(0)
            ).alias("qi")
        )
    )
    r, s, qi = F.col("r"), F.col("s"), F.col("qi")
    return q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((r - 1) * (r - 2) * (s - 1) * (s - 2))
        .cast("bigint")
        .alias("a_sum"),
        F.sum((r - 2) * (s - 2) * qi).cast("bigint").alias("b_sum"),
        F.sum(qi * (qi - 1)).cast("bigint").alias("c_sum"),
    )


@register(
    "rel_goodman_kruskal_gamma",
    oracle="""
    WITH sized AS (
      SELECT o.o_orderkey,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
             CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS x,
             LEAST(CAST(count(*) AS BIGINT), 7) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3),
    grid AS (
      SELECT yr, x, y, CAST(count(*) AS BIGINT) AS n
      FROM sized GROUP BY 1, 2, 3)
    SELECT a.yr,
           CAST(sum(CASE WHEN b.x > a.x AND b.y > a.y
                         THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
           CAST(sum(CASE WHEN b.x > a.x AND b.y < a.y
                         THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs
    FROM grid a JOIN grid b ON b.yr = a.yr
    GROUP BY a.yr
    """,
    description=(
        "Goodman–Kruskal gamma components between order priority "
        "(ordinal 1–5) and order size (line-item count capped at 7) "
        "per order year: concordant and discordant pair counts "
        "computed from the ≤35-cell contingency GRID (Σ nₐ·n_b over "
        "strictly-ordered cell pairs — never row pairs), the "
        "tie-ignoring ordinal association number next to "
        "evt_kendall_tau_matrix's tau. Shape: one orders⋈lineitem "
        "size rollup, one grid aggregate, a ≤35×35-per-year grid "
        "self-join on a broadcast-size frame"
    ),
    tags=("relational", "statistics", "correlation"),
)
def rel_goodman_kruskal_gamma(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("x"),
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    sized = (
        li.groupBy("l_orderkey")
        .agg(F.least(F.count(F.lit(1)), F.lit(7)).cast("bigint").alias("y"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    grid = sized.groupBy("yr", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    # ≤35 cells per year feeding both pair-join sides: cut the
    # orders⋈lineitem lineage once instead of re-deriving it per side
    ).localCheckpoint()
    b = grid.select(
        F.col("yr").alias("byr"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("n").alias("bn"),
    )
    conc = (F.col("bx") > F.col("x")) & (F.col("by") > F.col("y"))
    disc = (F.col("bx") > F.col("x")) & (F.col("by") < F.col("y"))
    return (
        grid.join(F.broadcast(b), F.col("byr") == F.col("yr"))
        .groupBy("yr")
        .agg(
            F.sum(F.when(conc, F.col("n") * F.col("bn")).otherwise(0))
            .cast("bigint")
            .alias("c_pairs"),
            F.sum(F.when(disc, F.col("n") * F.col("bn")).otherwise(0))
            .cast("bigint")
            .alias("d_pairs"),
        )
    )


@register(
    "evt_somers_d",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             CAST(datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE))
                  % 7 AS BIGINT) AS x,
             CAST((row_number() OVER (PARTITION BY event_type
                     ORDER BY CAST(round(value*100) AS BIGINT), event_id)
                   - 1) * 5
                  // count(*) OVER (PARTITION BY event_type)
                  AS BIGINT) + 1 AS y
      FROM events
      WHERE value IS NOT NULL
        AND CAST(ts AS DATE) >= DATE '{_EPOCH_DAY}'),
    grid AS (
      SELECT event_type, x, y, CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2, 3),
    pairs AS (
      SELECT a.event_type,
             sum(CASE WHEN b.x > a.x AND b.y > a.y
                      THEN a.n * b.n ELSE 0 END) AS c_pairs,
             sum(CASE WHEN b.x > a.x AND b.y < a.y
                      THEN a.n * b.n ELSE 0 END) AS d_pairs,
             sum(CASE WHEN b.x > a.x AND b.y = a.y
                      THEN a.n * b.n ELSE 0 END) AS t_y,
             sum(CASE WHEN b.x = a.x AND b.y > a.y
                      THEN a.n * b.n ELSE 0 END) AS t_x
      FROM grid a JOIN grid b ON b.event_type = a.event_type
      GROUP BY a.event_type),
    ties AS (
      SELECT event_type,
             sum(n * (n - 1) // 2) AS t_xy,
             sum(n) AS nn
      FROM grid GROUP BY event_type)
    SELECT p.event_type,
           CAST(t.nn AS BIGINT) AS n,
           CAST(p.c_pairs AS BIGINT) AS c_pairs,
           CAST(p.d_pairs AS BIGINT) AS d_pairs,
           CAST(p.t_x AS BIGINT) AS t_x,
           CAST(p.t_y AS BIGINT) AS t_y,
           CAST(t.t_xy AS BIGINT) AS t_xy
    FROM pairs p JOIN ties t ON t.event_type = p.event_type
    """,
    description=(
        "Somers' d_yx components for weekday → spend-quintile per "
        "event type: concordant/discordant counts plus the FULL tie "
        "decomposition (T_x, T_y, T_xy) from the 7×5 contingency "
        "grid, nearest-rank integer quintiles with event_id "
        "tie-break; the gate pins C+D+T_x+T_y+T_xy = N(N−1)/2 "
        "exactly and assembles d_yx = (C−D)/(C+D+T_y) — the "
        "direction-aware ordinal association gamma ignores ties on. "
        "Shape: one rank window per type, one grid aggregate, a "
        "≤35×35-per-type broadcast grid self-join"
    ),
    tags=("events", "statistics", "correlation"),
)
def evt_somers_d(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & (F.to_date("ts") >= F.lit(_EPOCH_DAY).cast("date"))
    )
    byt = Window.partitionBy("event_type")
    # nearest-rank quintile via INTEGER division (`div` / `//`): a
    # double division + bigint cast would truncate in Spark but ROUND
    # in DuckDB — the cross-engine cast trap the parity lint polices
    pts = ev.select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit(_EPOCH_DAY).cast("date")) % 7
        )
        .cast("bigint")
        .alias("x"),
        (
            F.row_number().over(byt.orderBy("value_c", "event_id")) - 1
        ).alias("rk0"),
        F.count(F.lit(1)).over(byt).alias("cnt"),
    ).select(
        "event_type",
        "x",
        (F.expr("(rk0 * 5) div cnt").cast("bigint") + 1).alias("y"),
    )
    grid = pts.groupBy("event_type", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    # ≤35 cells per type feeding three consumers (both pair-join sides
    # and the tie totals)
    ).localCheckpoint()
    b = grid.select(
        F.col("event_type").alias("bt"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("n").alias("bn"),
    )
    j = grid.join(F.broadcast(b), F.col("bt") == F.col("event_type"))
    gx, gy, bx, by = F.col("x"), F.col("y"), F.col("bx"), F.col("by")
    nn = F.col("n") * F.col("bn")
    pairs = j.groupBy("event_type").agg(
        F.sum(F.when((bx > gx) & (by > gy), nn).otherwise(0)).alias(
            "c_pairs"
        ),
        F.sum(F.when((bx > gx) & (by < gy), nn).otherwise(0)).alias(
            "d_pairs"
        ),
        F.sum(F.when((bx > gx) & (by == gy), nn).otherwise(0)).alias("t_y"),
        F.sum(F.when((bx == gx) & (by > gy), nn).otherwise(0)).alias("t_x"),
    )
    ties = grid.groupBy("event_type").agg(
        F.sum(F.expr("n * (n - 1) div 2")).cast("bigint").alias("t_xy"),
        F.sum("n").cast("bigint").alias("n"),
    )
    return pairs.join(F.broadcast(ties), "event_type").select(
        "event_type",
        "n",
        F.col("c_pairs").cast("bigint").alias("c_pairs"),
        F.col("d_pairs").cast("bigint").alias("d_pairs"),
        F.col("t_x").cast("bigint").alias("t_x"),
        F.col("t_y").cast("bigint").alias("t_y"),
        "t_xy",
    )
