"""Round-6 continuation (batch t): Kendall rank correlation matrix.

All 10 type-pair tau-b statistics from ONE diagonal-free self-join of
the calendar-bounded day-pivot frame: concordant/discordant sums and
per-type tie counts are exact integers; tau-b's denominator is an
identical expression tree.  Complements `evt_spearman_view_purchase`
(one pair, rank-based) and `evt_correlation_matrix` (Pearson
components) with the third classical correlation.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_TYPES = ["click", "error", "purchase", "signup", "view"]
_G = {et: i + 1 for i, et in enumerate(_TYPES)}

_PIVOT_SQL = ",\n             ".join(
    f"CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))"
    f" FILTER (event_type = '{et}'), 0) AS BIGINT) AS x{i + 1}"
    for i, et in enumerate(_TYPES)
)

_S_CELLS_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN (a.x{i} - b.x{i}) * (a.x{j} - b.x{j}) > 0 THEN 1"
    f" WHEN (a.x{i} - b.x{i}) * (a.x{j} - b.x{j}) < 0 THEN -1"
    f" ELSE 0 END) AS BIGINT) AS s_{i}_{j}"
    for i, j in combinations(range(1, 6), 2)
)

_T_CELLS_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN a.x{i} = b.x{i} THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS t_{i}"
    for i in range(1, 6)
)

_PAIR_ROWS_SQL = "\n      UNION ALL\n".join(
    f"""      SELECT '{a}' AS type_a, '{b}' AS type_b,
             s_{_G[a]}_{_G[b]} AS s_stat,
             t_{_G[a]} AS ties_a, t_{_G[b]} AS ties_b, n_pairs,
             CAST(s_{_G[a]}_{_G[b]} AS DOUBLE)
               / sqrt(CAST(n_pairs - t_{_G[a]} AS DOUBLE)
                      * CAST(n_pairs - t_{_G[b]} AS DOUBLE)) AS tau_b
      FROM cells"""
    for a, b in combinations(_TYPES, 2)
)


@register(
    "evt_kendall_tau_matrix",
    oracle=rf"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             {_PIVOT_SQL}
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    cells AS (
      SELECT {_S_CELLS_SQL},
             {_T_CELLS_SQL},
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM d a JOIN d b ON a.day < b.day)
{_PAIR_ROWS_SQL}
    """,
    description="Kendall tau-b correlation matrix across the 5 "
    "event-type daily series: concordant/discordant sums and per-type "
    "tie counts as exact integers from ONE day-pair self-join, tau-b "
    "denominators via identical trees - completes the Pearson/"
    "Spearman/Kendall correlation triple",
    tags=("events", "statistics", "timeseries"),
)
def evt_kendall_tau_matrix(spark, sf_dir):
    """Monotone association between every pair of series, robust to
    outliers and nonlinearity — the third correlation after Pearson
    (`evt_correlation_matrix`) and Spearman
    (`evt_spearman_view_purchase`).

    τ_b = S / sqrt((n₀−T_i)(n₀−T_j)) where S counts concordant minus
    discordant day pairs and T are tied pairs per series.  The pair
    join runs on the CALENDAR-bounded day-pivot frame (435 pairs for a
    month, ~7M for a decade — never the fact table), and all 15
    sufficient statistics (10 S cells + 5 tie counts) come from the
    SAME single aggregation over that join; the 10 output rows are a
    posexplode of literal pair structs (cf. `evt_tukey_pairs`).

    Determinism: S, T, n₀ are exact integers; τ_b is one identical
    tree per pair.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == et, F.col("value_c"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"x{i + 1}")
            for i, et in enumerate(_TYPES)
        ]
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day"))
    cells = []
    for i, j in combinations(range(1, 6), 2):
        prod = (F.col(f"a.x{i}") - F.col(f"b.x{i}")) * (
            F.col(f"a.x{j}") - F.col(f"b.x{j}")
        )
        cells.append(
            F.sum(
                F.when(prod > 0, 1).when(prod < 0, -1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"s_{i}_{j}")
        )
    for i in range(1, 6):
        cells.append(
            F.sum(
                F.when(F.col(f"a.x{i}") == F.col(f"b.x{i}"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"t_{i}")
        )
    cells.append(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    c = pairs.agg(*cells)

    def pair_struct(ta, tb):
        i, j = _G[ta], _G[tb]
        tau = F.col(f"s_{i}_{j}").cast("double") / F.sqrt(
            (F.col("n_pairs") - F.col(f"t_{i}")).cast("double")
            * (F.col("n_pairs") - F.col(f"t_{j}")).cast("double")
        )
        return F.struct(
            F.lit(ta).alias("type_a"),
            F.lit(tb).alias("type_b"),
            F.col(f"s_{i}_{j}").alias("s_stat"),
            F.col(f"t_{i}").alias("ties_a"),
            F.col(f"t_{j}").alias("ties_b"),
            F.col("n_pairs").alias("n_pairs"),
            tau.alias("tau_b"),
        )

    out = c.select(
        F.explode(
            F.array(
                *[pair_struct(ta, tb) for ta, tb in combinations(_TYPES, 2)]
            )
        ).alias("p")
    )
    return out.select("p.*")
