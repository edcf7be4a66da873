"""Round-9 batch aj: procurement price-dispersion auditing.

``rel_price_dispersion`` — the maverick-buying audit: for every part
sold on 3+ line items, the exact min / lower-median / max unit price
and the dispersion numbers (spread, mid-spread ratio numerators).  The
same part transacting at widely different unit prices is the classic
procurement leak (off-contract buying, missed volume tiers);
`rel_weighted_median_price` prices the CATALOG, this audits the
TRANSACTIONS.  Per-part medians come from map-side sorted arrays (the
r9g Croston machinery — line counts per part are small by TPC-H
construction), so no rank window ever touches fact-sized data.

Determinism: unit prices are ep DIV q on non-negative operands
(floored identically); the lower median is element (n+1) DIV 2 of the
sorted array in both engines; every emitted column is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import t
from .registry import register

_MIN_LINES = 3


@register(
    "rel_price_dispersion",
    oracle=f"""
    WITH l AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               // CAST(round(l_quantity) AS BIGINT) AS u_c
      FROM lineitem),
    arr AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             list_sort(list(u_c)) AS us
      FROM l GROUP BY l_partkey
      HAVING count(*) >= {_MIN_LINES})
    SELECT l_partkey, n_lines,
           CAST(us[1] AS BIGINT) AS p_min,
           CAST(us[CAST((n_lines + 1) // 2 AS INTEGER)] AS BIGINT)
             AS p_med,
           CAST(us[CAST(n_lines AS INTEGER)] AS BIGINT) AS p_max,
           CAST(us[CAST(n_lines AS INTEGER)] - us[1] AS BIGINT)
             AS spread_c,
           CAST((us[CAST(n_lines AS INTEGER)] - us[1]) * 10000
                // us[CAST((n_lines + 1) // 2 AS INTEGER)] AS BIGINT)
             AS spread_bp_of_med
    FROM arr
    """,
    description=(
        "procurement price-dispersion audit per part (3+ line items): "
        "exact min / lower-median / max unit price (ep DIV q cents, "
        "non-negative ⇒ floored identically), the absolute spread, "
        "and the spread in floored basis points of the median — the "
        "maverick-buying leak detector (same part, wildly different "
        "prices). Medians are element (n+1) DIV 2 of map-side sorted "
        "per-part arrays (TPC-H line counts per part are small by "
        "construction — the Croston collect-sort machinery), so "
        "nothing fact-sized is ever rank-windowed. Shape: ONE "
        "l_partkey aggregate with map-side array sorts"
    ),
    tags=("relational", "audit", "supplychain"),
)
def rel_price_dispersion(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    l = li.select(
        "l_partkey",
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
            " DIV CAST(round(l_quantity) AS BIGINT)"
        ).alias("u_c"),
    )
    arr = (
        l.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.array_sort(F.collect_list("u_c")).alias("us"),
        )
        .filter(F.col("n_lines") >= _MIN_LINES)
    )
    med = F.expr("element_at(us, CAST((n_lines + 1) DIV 2 AS INT))")
    mx = F.expr("element_at(us, CAST(n_lines AS INT))")
    mn = F.expr("element_at(us, 1)")
    return arr.select(
        "l_partkey",
        "n_lines",
        mn.cast("bigint").alias("p_min"),
        med.cast("bigint").alias("p_med"),
        mx.cast("bigint").alias("p_max"),
        (mx - mn).cast("bigint").alias("spread_c"),
        F.expr(
            "((element_at(us, CAST(n_lines AS INT)) - element_at(us, 1))"
            " * 10000) DIV element_at(us, CAST((n_lines + 1) DIV 2 AS INT))"
        )
        .cast("bigint")
        .alias("spread_bp_of_med"),
    )
