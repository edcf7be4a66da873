"""Round-6 continuation (batch i): stratified association and
statistical process control.

Both reuse the static-strata pivot discipline from
``queries_r6h.evt_standardized_rates``: fixed stratum domains become
columns, k-term double sums become explicit left-assoc expression
trees, and every count stays an exact integer.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_BANDS = [0, 1, 2, 3]

_CMH_CELLS_SQL = ",\n             ".join(
    f"CAST(count(*) FILTER (band = {b} AND exposed = 1 AND hit = 1) "
    f"AS BIGINT) AS a{b},\n"
    f"             CAST(count(*) FILTER (band = {b} AND exposed = 1) "
    f"AS BIGINT) AS r1_{b},\n"
    f"             CAST(count(*) FILTER (band = {b} AND hit = 1) "
    f"AS BIGINT) AS c1_{b},\n"
    f"             CAST(count(*) FILTER (band = {b}) AS BIGINT) AS n_{b}"
    for b in _BANDS
)

_CMH_E_SQL = " + ".join(
    f"CAST(r1_{b} AS DOUBLE) * CAST(c1_{b} AS DOUBLE) "
    f"/ CAST(n_{b} AS DOUBLE)"
    for b in _BANDS
)

_CMH_V_SQL = " + ".join(
    f"CAST(r1_{b} AS DOUBLE) * CAST(n_{b} - r1_{b} AS DOUBLE)"
    f" * CAST(c1_{b} AS DOUBLE) * CAST(n_{b} - c1_{b} AS DOUBLE)"
    f" / (CAST(n_{b} AS DOUBLE) * CAST(n_{b} AS DOUBLE)"
    f" * (CAST(n_{b} AS DOUBLE) - 1.0))"
    for b in _BANDS
)


@register(
    "evt_cmh_test",
    oracle=rf"""
    WITH base AS (
      SELECT CAST(hour(ts) AS INT) // 6 AS band,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
               AS exposed,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events),
    cells AS (
      SELECT {_CMH_CELLS_SQL}
      FROM base),
    s AS (
      SELECT CAST(a0 + a1 + a2 + a3 AS BIGINT) AS a_total,
             ({_CMH_E_SQL}) AS e_total,
             ({_CMH_V_SQL}) AS v_total,
             CAST(n_0 + n_1 + n_2 + n_3 AS BIGINT) AS n
      FROM cells)
    SELECT n, a_total, e_total, v_total,
           (abs(CAST(a_total AS DOUBLE) - e_total) - 0.5)
             * (abs(CAST(a_total AS DOUBLE) - e_total) - 0.5)
             / v_total AS cmh_chi2
    FROM s
    """,
    description="Cochran-Mantel-Haenszel test of weekend exposure vs "
    "purchase outcome stratified by 6h time-of-day band: exact 2x2 "
    "cell integers per static stratum, hypergeometric E and V as "
    "left-assoc 4-term sums, continuity-corrected chi-square",
    tags=("events", "statistics"),
)
def evt_cmh_test(spark, sf_dir):
    """Stratified 2×2 association — Simpson's-paradox-proof A/B readout.

    Does the weekend change the purchase rate, CONTROLLING for
    time-of-day (weekend traffic skews by hour, and hour affects
    purchases — the textbook confounder)?  CMH pools the per-stratum
    2×2 tables: Σa vs ΣE[a] with hypergeometric variance, exactly the
    machinery of `evt_logrank_table` with time-of-day strata instead
    of event times — strata here are STATIC (4 six-hour bands), so the
    16 cell counts pivot into one aggregation row and E/V are explicit
    left-assoc sums (no float SUM() ordering left to the engine).

    Scale: ONE fact-table pass to a single 16-cell row; constant work
    after.
    """
    ev = keyed_events(spark, sf_dir)
    base = ev.select(
        F.expr("CAST(hour(ts) AS INT) DIV 6").alias("band"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias(
            "exposed"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "hit"
        ),
    )
    cells = []
    for b in _BANDS:
        inb = F.col("band") == b
        cells += [
            F.sum(
                F.when(inb & (F.col("exposed") == 1) & (F.col("hit") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias(f"a{b}"),
            F.sum(F.when(inb & (F.col("exposed") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias(f"r1_{b}"),
            F.sum(F.when(inb & (F.col("hit") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias(f"c1_{b}"),
            F.sum(F.when(inb, 1).otherwise(0)).cast("bigint").alias(f"n_{b}"),
        ]
    c = base.agg(*cells)

    def e_term(b):
        return (
            F.col(f"r1_{b}").cast("double")
            * F.col(f"c1_{b}").cast("double")
            / F.col(f"n_{b}").cast("double")
        )

    def v_term(b):
        nb = F.col(f"n_{b}").cast("double")
        return (
            F.col(f"r1_{b}").cast("double")
            * (F.col(f"n_{b}") - F.col(f"r1_{b}")).cast("double")
            * F.col(f"c1_{b}").cast("double")
            * (F.col(f"n_{b}") - F.col(f"c1_{b}")).cast("double")
            / (nb * nb * (nb - F.lit(1.0)))
        )

    e_total = ((e_term(0) + e_term(1)) + e_term(2)) + e_term(3)
    v_total = ((v_term(0) + v_term(1)) + v_term(2)) + v_term(3)
    s = c.select(
        (F.col("a0") + F.col("a1") + F.col("a2") + F.col("a3"))
        .cast("bigint")
        .alias("a_total"),
        e_total.alias("e_total"),
        v_total.alias("v_total"),
        (F.col("n_0") + F.col("n_1") + F.col("n_2") + F.col("n_3"))
        .cast("bigint")
        .alias("n"),
    )
    dev = F.abs(F.col("a_total").cast("double") - F.col("e_total")) - F.lit(
        0.5
    )
    return s.select(
        "n", "a_total", "e_total", "v_total",
        (dev * dev / F.col("v_total")).alias("cmh_chi2"),
    )


@register(
    "evt_p_chart",
    oracle=r"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS defects
      FROM events GROUP BY CAST(ts AS DATE)),
    t AS (
      SELECT day, n, defects,
             sum(defects) OVER () AS tot_d,
             sum(n) OVER () AS tot_n
      FROM d),
    lim AS (
      SELECT day, n, defects, tot_d, tot_n,
             CAST(tot_d AS DOUBLE) / CAST(tot_n AS DOUBLE) AS pbar,
             CAST(defects AS DOUBLE) / CAST(n AS DOUBLE) AS p
      FROM t)
    SELECT day,
           CAST(n AS BIGINT) AS n,
           CAST(defects AS BIGINT) AS defects,
           p, pbar,
           pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE))
             AS ucl,
           greatest(pbar - 3.0 * sqrt(pbar * (1.0 - pbar)
                                      / CAST(n AS DOUBLE)), 0.0) AS lcl,
           CAST(CASE WHEN p > pbar + 3.0 * sqrt(pbar * (1.0 - pbar)
                                      / CAST(n AS DOUBLE))
                  OR p < greatest(pbar - 3.0 * sqrt(pbar * (1.0 - pbar)
                                      / CAST(n AS DOUBLE)), 0.0)
                THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM lim
    """,
    description="Shewhart p-chart of the daily error proportion: "
    "center line from pooled counts, 3-sigma binomial limits per day "
    "(variable subgroup size), exact integer counts with "
    "identical-tree limits and out-of-control flags",
    tags=("events", "statistics", "quality"),
)
def evt_p_chart(spark, sf_dir):
    """Statistical process control for a rate — the ops-floor classic.

    Each day is a subgroup; the monitored proportion is the error
    share.  The center line is the POOLED proportion (Σd/Σn, exact
    integers), and each day gets its own 3σ binomial limits
    ``p̄ ± 3·sqrt(p̄(1−p̄)/n_day)`` (variable-n p-chart; LCL floored at
    0).  Out-of-control days are flagged with the same expressions the
    limits use, so both engines agree bit-for-bit on the flag.

    Complements `evt_cusum_alarms` (sequential drift) and
    `evt_slo_burn_rate` (budget windows) with the per-subgroup
    Shewhart view.

    Scale: one day-grain agg of the fact table; the pooled totals are
    windows over the calendar-bounded day frame (single lineage).
    """
    ev = keyed_events(spark, sf_dir)
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("defects"),
    )
    wall = Window.partitionBy()
    t_ = d.select(
        "day", "n", "defects",
        F.sum("defects").over(wall).alias("tot_d"),
        F.sum("n").over(wall).alias("tot_n"),
    )
    pbar = F.col("tot_d").cast("double") / F.col("tot_n").cast("double")
    p = F.col("defects").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n").cast("double"))
    ucl = pbar + F.lit(3.0) * sig
    lcl = F.greatest(pbar - F.lit(3.0) * sig, F.lit(0.0))
    return t_.select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.col("defects").cast("bigint").alias("defects"),
        p.alias("p"),
        pbar.alias("pbar"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        F.when((p > ucl) | (p < lcl), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("out_of_control"),
    )
