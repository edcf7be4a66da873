"""Round-6 continuation (batch k): pooled effect size and extreme-value
capacity planning.

`evt_odds_ratio_mh` adds the effect-size readout to `evt_cmh_test`'s
significance readout (same static-strata pivot).  `evt_extreme_value_
gumbel` fits block maxima by method of moments with every
transcendental constant written as the SAME literal/function on both
engines, so even the log-based return level is bit-deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_BANDS = [0, 1, 2, 3]

_MH_CELLS_SQL = ",\n             ".join(
    f"CAST(count(*) FILTER (band = {b} AND exposed = 1 AND hit = 1) "
    f"AS BIGINT) AS a{b},\n"
    f"             CAST(count(*) FILTER (band = {b} AND exposed = 1 "
    f"AND hit = 0) AS BIGINT) AS b{b},\n"
    f"             CAST(count(*) FILTER (band = {b} AND exposed = 0 "
    f"AND hit = 1) AS BIGINT) AS c{b},\n"
    f"             CAST(count(*) FILTER (band = {b} AND exposed = 0 "
    f"AND hit = 0) AS BIGINT) AS d{b}"
    for b in _BANDS
)

_MH_NUM_SQL = " + ".join(
    f"CAST(a{b} AS DOUBLE) * CAST(d{b} AS DOUBLE)"
    f" / CAST(a{b} + b{b} + c{b} + d{b} AS DOUBLE)"
    for b in _BANDS
)

_MH_DEN_SQL = " + ".join(
    f"CAST(b{b} AS DOUBLE) * CAST(c{b} AS DOUBLE)"
    f" / CAST(a{b} + b{b} + c{b} + d{b} AS DOUBLE)"
    for b in _BANDS
)


@register(
    "evt_odds_ratio_mh",
    oracle=rf"""
    WITH base AS (
      SELECT CAST(hour(ts) AS INT) // 6 AS band,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
               AS exposed,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events),
    cells AS (
      SELECT {_MH_CELLS_SQL}
      FROM base)
    SELECT CAST(a0 + a1 + a2 + a3 AS BIGINT) AS a_total,
           CAST(b0 + b1 + b2 + b3 AS BIGINT) AS b_total,
           CAST(c0 + c1 + c2 + c3 AS BIGINT) AS c_total,
           CAST(d0 + d1 + d2 + d3 AS BIGINT) AS d_total,
           ({_MH_NUM_SQL}) AS mh_num,
           ({_MH_DEN_SQL}) AS mh_den,
           ({_MH_NUM_SQL}) / ({_MH_DEN_SQL}) AS or_mh
    FROM cells
    """,
    description="Mantel-Haenszel pooled odds ratio of weekend exposure "
    "vs purchase stratified by 6h band: the effect-size companion to "
    "evt_cmh_test's chi-square, exact 2x2 integers per static stratum "
    "and left-assoc Σ(ad/n)/Σ(bc/n)",
    tags=("events", "statistics"),
)
def evt_odds_ratio_mh(spark, sf_dir):
    """HOW MUCH does the weekend move purchases, net of time-of-day.

    `evt_cmh_test` answers 'is there an association'; the
    Mantel-Haenszel odds ratio answers 'how large':
    ``OR_MH = Σ_b(a·d/n) / Σ_b(b·c/n)`` — a precision-weighted pool of
    the per-stratum odds ratios that is consistent even when strata
    are sparse.  Same plan as CMH: the 16 cells of the 4 static strata
    pivot into ONE aggregation row; numerator and denominator are
    explicit left-assoc 4-term sums.

    Scale: one fact pass, 0 exchanges (global aggregation only).
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
        exp1 = F.col("exposed") == 1
        hit1 = F.col("hit") == 1
        for name, cond in [
            (f"a{b}", inb & exp1 & hit1),
            (f"b{b}", inb & exp1 & ~hit1),
            (f"c{b}", inb & ~exp1 & hit1),
            (f"d{b}", inb & ~exp1 & ~hit1),
        ]:
            cells.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("bigint")
                .alias(name)
            )
    c = base.agg(*cells)

    def nb(b):
        return (
            F.col(f"a{b}") + F.col(f"b{b}") + F.col(f"c{b}") + F.col(f"d{b}")
        ).cast("double")

    def num_term(b):
        return (
            F.col(f"a{b}").cast("double")
            * F.col(f"d{b}").cast("double")
            / nb(b)
        )

    def den_term(b):
        return (
            F.col(f"b{b}").cast("double")
            * F.col(f"c{b}").cast("double")
            / nb(b)
        )

    num = ((num_term(0) + num_term(1)) + num_term(2)) + num_term(3)
    den = ((den_term(0) + den_term(1)) + den_term(2)) + den_term(3)
    return c.select(
        (F.col("a0") + F.col("a1") + F.col("a2") + F.col("a3"))
        .cast("bigint")
        .alias("a_total"),
        (F.col("b0") + F.col("b1") + F.col("b2") + F.col("b3"))
        .cast("bigint")
        .alias("b_total"),
        (F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3"))
        .cast("bigint")
        .alias("c_total"),
        (F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3"))
        .cast("bigint")
        .alias("d_total"),
        num.alias("mh_num"),
        den.alias("mh_den"),
        (num / den).alias("or_mh"),
    )


#: Euler-Mascheroni constant — the SAME literal on both engine sides.
_EULER_GAMMA = "0.5772156649015329"


@register(
    "evt_extreme_value_gumbel",
    oracle=rf"""
    WITH m AS (
      SELECT CAST(ts AS DATE) AS day,
             max(CAST(round(value * 100) AS BIGINT)) AS mx
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mx) AS BIGINT) AS sm,
             CAST(max(mx) AS BIGINT) AS observed_max,
             sum(CAST(mx AS HUGEINT) * mx) AS qm
      FROM m),
    fit AS (
      SELECT n, sm, observed_max,
             CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean_max,
             sqrt((CAST(n AS DOUBLE) * CAST(qm AS DOUBLE)
                   - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               AS sd_max
      FROM s),
    p AS (
      SELECT n, observed_max, mean_max, sd_max,
             sd_max * sqrt(6.0) / pi() AS beta
      FROM fit)
    SELECT n AS n_blocks, observed_max, mean_max, sd_max, beta,
           mean_max - {_EULER_GAMMA} * beta AS mu,
           (mean_max - {_EULER_GAMMA} * beta)
             - beta * ln(-ln(0.99)) AS return_level_100
    FROM p
    """,
    description="Gumbel extreme-value fit of daily block maxima by "
    "method of moments (beta = s*sqrt(6)/pi, mu = mean - gamma*beta) "
    "and the 100-block return level mu - beta*ln(-ln(0.99)) - every "
    "transcendental from the same literal/function on both engines",
    tags=("events", "statistics", "timeseries"),
)
def evt_extreme_value_gumbel(spark, sf_dir):
    """What daily peak should capacity planning expect once in 100
    days? — classical extreme-value theory on block maxima.

    Daily maxima of the value series are Gumbel-attracted for
    light-tailed bases; method-of-moments gives
    ``β = s·√6/π, μ = x̄ − γβ`` and the once-in-k return level
    ``μ − β·ln(−ln(1−1/k))``.  The sufficient statistics (n, Σmax,
    Σmax², max) are exact integers; β/μ/return-level are identical
    expression trees whose only transcendentals are ``sqrt(6)``,
    ``pi()``/``math.pi`` (the same IEEE double), the shared
    Euler-Mascheroni literal, and ``ln(-ln(0.99))`` computed from the
    same literal on both sides.

    Complements `evt_peak_detection` (which finds past peaks) with the
    forward-looking tail quantile, and `evt_drawdown` on the other
    tail.

    Scale: one fact pass to the calendar-bounded day frame, one 4-cell
    aggregation.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    m = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.max("value_c").alias("mx")
    )
    dec = "decimal(38,0)"
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("sm"),
        F.max("mx").cast("bigint").alias("observed_max"),
        F.sum((F.col("mx").cast(dec) * F.col("mx")).cast(dec)).alias("qm"),
    )
    nd = F.col("n").cast("double")
    mean_max = F.col("sm").cast("double") / nd
    sd_max = F.sqrt(
        (
            nd * F.col("qm").cast("double")
            - F.col("sm").cast("double") * F.col("sm").cast("double")
        )
        / (nd * (nd - F.lit(1.0)))
    )
    fit = s.select(
        "n", "observed_max",
        mean_max.alias("mean_max"),
        sd_max.alias("sd_max"),
    )
    beta = F.col("sd_max") * F.sqrt(F.lit(6.0)) / F.lit(math.pi)
    p = fit.select(
        "n", "observed_max", "mean_max", "sd_max", beta.alias("beta")
    )
    gamma = F.lit(float(_EULER_GAMMA))
    mu = F.col("mean_max") - gamma * F.col("beta")
    return p.select(
        F.col("n").alias("n_blocks"),
        "observed_max", "mean_max", "sd_max", "beta",
        mu.alias("mu"),
        (mu - F.col("beta") * F.log(-F.log(F.lit(0.99)))).alias(
            "return_level_100"
        ),
    )
