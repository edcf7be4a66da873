"""Round-12a batch: Kuiper two-sample drift and Benjamini–Yekutieli FDR.

``evt_kuiper_test`` — the Kuiper V = D⁺ + D⁻ two-sample statistic per
event type (first half of the month vs second), on the SAME pooled
integer ECDF lattice as ``evt_ks_drift``: V is the cyclic-invariant
variant of KS that weights both tails equally (KS concentrates power at
the median; Kuiper catches shifts in either tail symmetrically — the
classic choice for drift in wrap-around or heavy-tailed monitors).
Both one-sided suprema are exact integers max(n₂F₁ − n₁F₂) /
max(n₁F₂ − n₂F₁) over pooled distinct values; only the final
normalization divides.

``evt_benjamini_yekutieli`` — the BY step-up rule next to the existing
``evt_fdr_bh``: BH controls FDR under independence, BY under ARBITRARY
dependence by spending the harmonic factor c(m) = Σ 1/i. Hypotheses:
per-type exact two-sided SIGN TESTS on the first 12 day-over-day moves
(p-values are exact binomial tails in 4096ths — the Bin(12, ½) tail
table is 7 literals, no incomplete beta needed), m is the realized
hypothesis count, c(m) rides as an exact rational from an inline m→
(num, den) lookup (m ≤ 8), and both step-up rules reduce to integer
cross-multiplications: BH rejects rank k when m·p ≤ 1024·k, BY when
m·p·c_num ≤ 1024·k·c_den (α = ¼ literal). Emitting both flags makes
the harmonic penalty visible: every BY rejection is a BH rejection,
never the reverse.

Scale: both queries are one fact-table pass into a bounded frame —
Kuiper's window runs per type over pooled distinct cent values
(map-side partial counts first), the sign tests over |types|·13 daily
rows; the step-up window ranks ≤ |types| rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: Bin(12, 1/2) two-sided sign-test tails, in 4096ths: j = min(k, 12-k)
#: -> p_num = min(4096, 2 * sum_{i<=j} C(12, i)).
_SIGN_P_4096 = {0: 2, 1: 26, 2: 158, 3: 598, 4: 1588, 5: 3172, 6: 4096}
#: Harmonic numbers c(m) = sum_{i=1..m} 1/i as exact rationals, m <= 8.
_HARMONIC = {
    1: (1, 1),
    2: (3, 2),
    3: (11, 6),
    4: (25, 12),
    5: (137, 60),
    6: (49, 20),
    7: (363, 140),
    8: (761, 280),
}

_SIGN_SQL = "CASE least(k_up, 12 - k_up) " + " ".join(
    f"WHEN {j} THEN {p}" for j, p in sorted(_SIGN_P_4096.items())
) + " END"
_CNUM_SQL = "CASE m " + " ".join(
    f"WHEN {m} THEN {nd[0]}" for m, nd in sorted(_HARMONIC.items())
) + " END"
_CDEN_SQL = "CASE m " + " ".join(
    f"WHEN {m} THEN {nd[1]}" for m, nd in sorted(_HARMONIC.items())
) + " END"


@register(
    "evt_kuiper_test",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c,
             CASE WHEN EXTRACT(day FROM ts) >= 16 THEN 1 ELSE 0 END AS late
      FROM events WHERE value IS NOT NULL),
    cnts AS (
      SELECT event_type, value_c,
             sum(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS c2
      FROM base GROUP BY event_type, value_c),
    cum AS (
      SELECT event_type, value_c,
             sum(c1) OVER (PARTITION BY event_type ORDER BY value_c) AS f1,
             sum(c2) OVER (PARTITION BY event_type ORDER BY value_c) AS f2,
             sum(c1) OVER (PARTITION BY event_type) AS n1,
             sum(c2) OVER (PARTITION BY event_type) AS n2
      FROM cnts),
    agg AS (
      SELECT event_type,
             CAST(max(n1) AS BIGINT) AS n1,
             CAST(max(n2) AS BIGINT) AS n2,
             CAST(greatest(max(f1 * n2 - f2 * n1), 0) AS BIGINT)
               AS dplus_num,
             CAST(greatest(max(f2 * n1 - f1 * n2), 0) AS BIGINT)
               AS dminus_num
      FROM cum GROUP BY event_type)
    SELECT event_type, n1, n2, dplus_num, dminus_num,
           CAST(dplus_num + dminus_num AS BIGINT) AS kuiper_num,
           round(CAST(dplus_num + dminus_num AS DOUBLE) / (n1 * n2), 6)
             AS kuiper_v
    FROM agg
    """,
    description=(
        "two-sample Kuiper drift test per event type (first vs second "
        "half of the month): V = D+ + D- over the pooled integer ECDF "
        "lattice — the cyclic-invariant KS variant with equal tail "
        "sensitivity (KS power concentrates mid-distribution; Kuiper "
        "catches either tail). Both suprema exact integers "
        "max(+-(n2*F1 - n1*F2)); one fact pass, per-type window over "
        "pooled distinct cent values"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_kuiper_test(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.col("value_c"),
        F.when(F.dayofmonth("ts") >= 16, F.lit(1)).otherwise(F.lit(0))
        .alias("late"),
    )
    cnts = base.groupBy("event_type", "value_c").agg(
        F.sum(F.when(F.col("late") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("late") == 1, 1).otherwise(0)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = cnts.select(
        "event_type",
        F.sum("c1").over(w_cum).alias("f1"),
        F.sum("c2").over(w_cum).alias("f2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    agg = cum.groupBy("event_type").agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.greatest(
            F.max(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("dplus_num"),
        F.greatest(
            F.max(F.col("f2") * F.col("n1") - F.col("f1") * F.col("n2")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("dminus_num"),
    )
    return agg.select(
        "event_type",
        "n1",
        "n2",
        "dplus_num",
        "dminus_num",
        (F.col("dplus_num") + F.col("dminus_num"))
        .cast("bigint")
        .alias("kuiper_num"),
        F.round(
            (F.col("dplus_num") + F.col("dminus_num")).cast("double")
            / (F.col("n1") * F.col("n2")),
            6,
        ).alias("kuiper_v"),
    )


@register(
    "evt_benjamini_yekutieli",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS i,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM d),
    mv AS (
      SELECT event_type, i,
             CASE WHEN x > lag(x) OVER (PARTITION BY event_type
                                        ORDER BY i)
                  THEN 1 ELSE 0 END AS up
      FROM s WHERE nd >= 13 AND i <= 13),
    hyp AS (
      SELECT event_type,
             CAST(sum(up) AS BIGINT) AS k_up
      FROM mv WHERE i >= 2 GROUP BY event_type),
    p AS (
      SELECT event_type, k_up,
             CAST({_SIGN_SQL} AS BIGINT) AS p_num
      FROM hyp),
    ranked AS (
      SELECT event_type, k_up, p_num,
             CAST(row_number() OVER (ORDER BY p_num, event_type)
                  AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM p),
    haz AS (
      SELECT r.*,
             CAST({_CNUM_SQL} AS BIGINT) AS c_num,
             CAST({_CDEN_SQL} AS BIGINT) AS c_den
      FROM ranked r),
    cut AS (
      SELECT coalesce(max(CASE WHEN m * p_num <= 1024 * rnk
                                THEN rnk END), 0) AS k_bh,
             coalesce(max(CASE WHEN m * p_num * c_num
                                    <= 1024 * rnk * c_den
                                THEN rnk END), 0) AS k_by
      FROM haz)
    SELECT h.event_type, h.k_up, h.p_num, h.rnk, h.m,
           CAST(CASE WHEN h.rnk <= c.k_bh THEN 1 ELSE 0 END AS BIGINT)
             AS bh_reject,
           CAST(CASE WHEN h.rnk <= c.k_by THEN 1 ELSE 0 END AS BIGINT)
             AS by_reject
    FROM haz h CROSS JOIN cut c
    """,
    description=(
        "Benjamini-Yekutieli FDR under arbitrary dependence, next to "
        "the existing BH query: per-type exact two-sided sign tests "
        "on the first 12 day-over-day moves (binomial tails in "
        "4096ths — a 7-literal Bin(12,1/2) table, no incomplete "
        "beta), realized m, harmonic c(m) as an exact inline "
        "rational, and both step-up rules as integer "
        "cross-multiplications (BH: m*p <= 1024k; BY: m*p*c_num <= "
        "1024k*c_den at alpha=1/4). Both flags emitted — the "
        "harmonic penalty is visible as BY ⊆ BH"
    ),
    tags=("events", "statistics", "multiple-testing"),
)
def evt_benjamini_yekutieli(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "x",
        F.row_number().over(w_ord).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("nd"),
    )
    w_i = Window.partitionBy("event_type").orderBy("i")
    mv = (
        s.filter((F.col("nd") >= 13) & (F.col("i") <= 13))
        .select(
            "event_type",
            "i",
            F.when(F.col("x") > F.lag("x").over(w_i), 1)
            .otherwise(0)
            .alias("up"),
        )
    )
    hyp = (
        mv.filter(F.col("i") >= 2)
        .groupBy("event_type")
        .agg(F.sum("up").cast("bigint").alias("k_up"))
    )
    j = F.least(F.col("k_up"), F.lit(12) - F.col("k_up"))
    expr = None
    for jj, pp in sorted(_SIGN_P_4096.items()):
        expr = (
            F.when(j == jj, F.lit(pp))
            if expr is None
            else expr.when(j == jj, F.lit(pp))
        )
    # p feeds BOTH the m scalar and the ranked frame — without a
    # checkpoint each reference re-runs the fact scan + day fold (plan
    # audit measured 8 scans); the materialized frame is ≤|types| rows
    p = hyp.select(
        "event_type", "k_up", expr.cast("bigint").alias("p_num")
    ).localCheckpoint(eager=False)
    # m rides as a 1-row broadcast scalar (no single-partition window)
    m_df = p.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ranked = p.crossJoin(F.broadcast(m_df)).select(
        "event_type",
        "k_up",
        "p_num",
        F.row_number()
        .over(Window.orderBy("p_num", "event_type"))
        .cast("bigint")
        .alias("rnk"),
        "m",
    )
    c_num = None
    c_den = None
    for mm, (cn, cd) in sorted(_HARMONIC.items()):
        c_num = (
            F.when(F.col("m") == mm, F.lit(cn))
            if c_num is None
            else c_num.when(F.col("m") == mm, F.lit(cn))
        )
        c_den = (
            F.when(F.col("m") == mm, F.lit(cd))
            if c_den is None
            else c_den.when(F.col("m") == mm, F.lit(cd))
        )
    # haz feeds both the step-up cut scalar and the final projection
    haz = ranked.select(
        "*",
        c_num.cast("bigint").alias("c_num"),
        c_den.cast("bigint").alias("c_den"),
    ).localCheckpoint(eager=False)
    cut = haz.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("m") * F.col("p_num") <= 1024 * F.col("rnk"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("k_bh"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("m") * F.col("p_num") * F.col("c_num")
                    <= 1024 * F.col("rnk") * F.col("c_den"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("k_by"),
    )
    return haz.crossJoin(F.broadcast(cut)).select(
        "event_type",
        "k_up",
        "p_num",
        "rnk",
        "m",
        F.when(F.col("rnk") <= F.col("k_bh"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("bh_reject"),
        F.when(F.col("rnk") <= F.col("k_by"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("by_reject"),
    )
