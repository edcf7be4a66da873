"""Round-6 continuation (batch u): index-number theory.

Laspeyres / Paasche / Fisher price indices between two base years.
The denominators Σp₀q₀ and numerator Σp₁q₁ are EXACT integer revenue
cents; the cross terms Σp₁q₀ and Σp₀q₁ mix periods, so their per-part
terms are identical-tree doubles summed through a SORTED-ARRAY LEFT
FOLD (Spark ``aggregate`` == DuckDB ``list_reduce``, the
`evt_anova_oneway` pattern).  The ordered-cumulative-WINDOW form was
tried first and FAILED the bit-exact gate at this frame size (~460
parts, 2e-15 drift): DuckDB's windowed SUM uses a segment tree whose
pairwise combination order matches sequential accumulation only for
frames under its node size (~64 rows) — windows are fine for
month-sized day frames (`evt_jackknife_ratio`), folds are required
beyond that.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import t
from .registry import register

_Y0, _Y1 = 1995, 1996


@register(
    "rel_price_index",
    oracle=rf"""
    WITH p AS (
      SELECT l_partkey AS pk,
             CAST(coalesce(sum(CAST(round(l_quantity) AS BIGINT))
                  FILTER (year(l_shipdate) = {_Y0}), 0) AS BIGINT) AS q0,
             CAST(coalesce(sum(CAST(round(l_extendedprice * 100)
                  AS BIGINT)) FILTER (year(l_shipdate) = {_Y0}), 0)
                  AS BIGINT) AS r0,
             CAST(coalesce(sum(CAST(round(l_quantity) AS BIGINT))
                  FILTER (year(l_shipdate) = {_Y1}), 0) AS BIGINT) AS q1,
             CAST(coalesce(sum(CAST(round(l_extendedprice * 100)
                  AS BIGINT)) FILTER (year(l_shipdate) = {_Y1}), 0)
                  AS BIGINT) AS r1
      FROM lineitem
      WHERE year(l_shipdate) IN ({_Y0}, {_Y1})
      GROUP BY l_partkey),
    pp AS (
      SELECT pk, q0, r0, q1, r1,
             CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
               * CAST(q0 AS DOUBLE) AS p1q0,
             CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
               * CAST(q1 AS DOUBLE) AS p0q1
      FROM p WHERE q0 > 0 AND q1 > 0),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r0) AS BIGINT) AS v00,
             CAST(sum(r1) AS BIGINT) AS v11,
             list_reduce(
               list_transform(
                 list_sort(list(struct_pack(pk := pk, tm := p1q0))),
                 x -> x.tm),
               (a, b) -> a + b) AS sum_p1q0,
             list_reduce(
               list_transform(
                 list_sort(list(struct_pack(pk := pk, tm := p0q1))),
                 x -> x.tm),
               (a, b) -> a + b) AS sum_p0q1
      FROM pp),
    idx AS (
      SELECT n AS n_parts,
             v00 AS base_value_c,
             v11 AS curr_value_c,
             sum_p1q0 / CAST(v00 AS DOUBLE) AS laspeyres,
             CAST(v11 AS DOUBLE) / sum_p0q1 AS paasche
      FROM folded)
    SELECT n_parts, base_value_c, curr_value_c, laspeyres, paasche,
           sqrt(laspeyres * paasche) AS fisher
    FROM idx
    """,
    description="Laspeyres / Paasche / Fisher price indices between "
    "two base years over unit values per part: pure-period totals are "
    "exact integer cents; the mixed-period cross terms fold through an "
    "ordered cumulative window over the partkey-sorted frame so even "
    "the float sums are bit-deterministic",
    tags=("relational", "statistics", "allocation"),
)
def rel_price_index(spark, sf_dir):
    """Did prices rise, held at constant quantities? — the index-number
    answer, in all three classical forms.

    Unit values r_t/q_t per part stand in for prices; Laspeyres fixes
    base-period quantities (Σp₁q₀ / Σp₀q₀), Paasche current ones
    (Σp₁q₁ / Σp₀q₁), Fisher is their geometric mean (the
    superlative index that satisfies time reversal).  Σp₀q₀ and Σp₁q₁
    collapse to EXACT integer revenue totals; only the two
    mixed-period sums are genuinely float, and they accumulate through
    a partkey-sorted array left fold — both engines fold in the same
    sequence at ANY frame size (see the module docstring for why the
    window form fails past ~64 rows).

    Scale: one pruned fact pass (the year predicate pushes to the
    scan) to the part-grain pivot; windows run over |parts| rows.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(_Y0, _Y1)
    )
    is0 = F.year("l_shipdate") == _Y0
    p = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.coalesce(
            F.sum(F.when(is0, F.round("l_quantity").cast("bigint"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("q0"),
        F.coalesce(
            F.sum(
                F.when(
                    is0, F.round(F.col("l_extendedprice") * 100).cast("bigint")
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("r0"),
        F.coalesce(
            F.sum(F.when(~is0, F.round("l_quantity").cast("bigint"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("q1"),
        F.coalesce(
            F.sum(
                F.when(
                    ~is0,
                    F.round(F.col("l_extendedprice") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("r1"),
    )
    both = p.filter((F.col("q0") > 0) & (F.col("q1") > 0)).select(
        "pk", "q0", "r0", "q1", "r1",
        (
            F.col("r1").cast("double")
            / F.col("q1").cast("double")
            * F.col("q0").cast("double")
        ).alias("p1q0"),
        (
            F.col("r0").cast("double")
            / F.col("q0").cast("double")
            * F.col("q1").cast("double")
        ).alias("p0q1"),
    )
    def fold(col):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("pk").alias("pk"), col.alias("tm"))
                    )
                ),
                lambda x: x["tm"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    folded = both.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r0").cast("bigint").alias("v00"),
        F.sum("r1").cast("bigint").alias("v11"),
        fold(F.col("p1q0")).alias("sum_p1q0"),
        fold(F.col("p0q1")).alias("sum_p0q1"),
    )
    idx = folded.select(
        F.col("n").alias("n_parts"),
        F.col("v00").alias("base_value_c"),
        F.col("v11").alias("curr_value_c"),
        (F.col("sum_p1q0") / F.col("v00").cast("double")).alias(
            "laspeyres"
        ),
        (F.col("v11").cast("double") / F.col("sum_p0q1")).alias("paasche"),
    )
    return idx.select(
        "n_parts", "base_value_c", "curr_value_c", "laspeyres", "paasche",
        F.sqrt(F.col("laspeyres") * F.col("paasche")).alias("fisher"),
    )
