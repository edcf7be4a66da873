"""Round-9 batch ae: sequential likelihood-ratio monitoring and
second-order forensic digit analysis.

``evt_sprt_conversion`` — Wald's Sequential Probability Ratio Test
over the chronological stream of users (ordered by first activity):
did each user convert within a week of showing up?  The log-likelihood
ratio walks by one of two LITERAL micro-nat increments per user
(H₀ p = 0.5 vs H₁ p = 0.6, α = β = 0.05 ⇒ bounds ±ln 19), and the
test DECIDES at the first boundary crossing — the always-valid
continuous-monitoring member of the sequential family next to
`evt_sequential_boundary` (fixed interim looks) and `evt_page_hinkley`
(drift alarms).  The user stream is |users|-bounded, not event-bounded.

``evt_benford_two_digit`` — the first-TWO-digits Benford test over
event cent values: the forensic standard (Nigrini) beyond the
first-digit screen `evt_benford_audit` runs — fabricated or
threshold-gamed numbers often pass first-digit but fail the 90-cell
two-digit fit.  Expected probabilities log₁₀(1+1/d) for d = 10..99 are
a LITERAL micro-prob table embedded identically in both engines (no
log executes in either engine — the r9aa lattice discipline).

Determinism: SPRT increments/bounds and Benford probabilities are
Python-computed literals; conversion is an integer timestamp-difference
comparison; leading two digits come from integer string prefixes
(identical bigint→varchar rendering); counts are exact BIGINTs.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: SPRT literals: H0 p=1/2 vs H1 p=3/5, alpha = beta = 0.05
_INC1 = round(math.log(0.6 / 0.5) * 1e6)  # +182322 micro-nats
_INC0 = round(math.log(0.4 / 0.5) * 1e6)  # -223144 micro-nats
_BOUND = round(math.log(19.0) * 1e6)  # ln((1-b)/a) = ln 19
_CONV_DAYS = 7

#: Benford first-two-digit micro-probabilities (literal in both engines)
_BENFORD2_U = {d: round(math.log10(1 + 1 / d) * 1e6) for d in range(10, 100)}


@register(
    "evt_sprt_conversion",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             min(ts) AS first_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id),
    s AS (
      SELECT user_id, first_ts,
             CASE WHEN first_purchase IS NOT NULL
                   AND datediff('day', CAST(first_ts AS DATE),
                                CAST(first_purchase AS DATE))
                       <= {_CONV_DAYS}
                  THEN 1 ELSE 0 END AS x,
             row_number() OVER (ORDER BY first_ts, user_id) AS t
      FROM u),
    w AS (
      SELECT t, x,
             sum(CASE WHEN x = 1 THEN {_INC1} ELSE {_INC0} END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS llr_u
      FROM s),
    agg AS (
      -- pack (t, sign) so min() lands on the FIRST crossing's sign:
      -- t*2 + (0 if llr>0 else 1) is monotone in t (one row per t)
      SELECT count(*) AS n_users, sum(x) AS n_converted,
             max(CASE WHEN t = (SELECT max(t) FROM w) THEN llr_u END)
               AS llr_final_u,
             min(CASE WHEN abs(llr_u) >= {_BOUND}
                      THEN t * 2 + CASE WHEN llr_u > 0 THEN 0 ELSE 1 END
                 END) AS packed
      FROM w)
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(llr_final_u AS BIGINT) AS llr_final_u,
           CAST(coalesce(packed // 2, 0) AS BIGINT) AS first_cross_t,
           CAST(CASE WHEN packed IS NULL THEN 0
                     WHEN packed % 2 = 0 THEN 1 ELSE -1 END
                AS BIGINT) AS decision
    FROM agg
    """,
    description=(
        "Wald SPRT over the chronological user stream (ordered by "
        "first activity, user_id tie-break): x = converted within "
        f"{_CONV_DAYS} days of first appearance, log-likelihood ratio "
        f"walks by LITERAL micro-nat increments (+{_INC1}/{_INC0}; "
        "H₀ p = 0.5 vs H₁ p = 0.6) and decides at the first "
        f"±{_BOUND} (ln 19) crossing — always-valid continuous "
        "monitoring next to the fixed-look group-sequential test. "
        "Emits the stream length, conversions, the final LLR, and "
        "the first crossing position/direction (0 = never). The "
        "walk is |users|-bounded at any event volume. Shape: one "
        "user fold, one rank+cumsum window over the user frame "
        "(documented single-partition presentation seam), one fold"
    ),
    tags=("events", "statistics", "experimentation"),
)
def evt_sprt_conversion(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    s = u.select(
        "user_id",
        "first_ts",
        F.when(
            F.col("first_purchase").isNotNull()
            & (
                F.datediff(
                    F.to_date("first_purchase"), F.to_date("first_ts")
                )
                <= _CONV_DAYS
            ),
            1,
        )
        .otherwise(0)
        .alias("x"),
    ).withColumn(
        "t", F.row_number().over(Window.orderBy("first_ts", "user_id"))
    )
    w = s.select(
        "t",
        "x",
        F.sum(
            F.when(F.col("x") == 1, F.lit(_INC1)).otherwise(F.lit(_INC0))
        )
        .over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("llr_u"),
    ).withColumn(
        "t_max", F.max("t").over(Window.partitionBy())
    )
    crossed = F.abs(F.col("llr_u")) >= _BOUND
    # pack (t, sign) so the plain min() aggregate lands on the FIRST
    # crossing's sign (a bare min over signs would report -1 whenever
    # the walk ever dipped below -bound, even after crossing +bound
    # first): t*2 + (0 if llr>0 else 1) is monotone in t (one row per t)
    packed = F.min(
        F.when(
            crossed,
            F.col("t") * 2
            + F.when(F.col("llr_u") > 0, 0).otherwise(1),
        )
    )
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("n_converted"),
        F.max(F.when(F.col("t") == F.col("t_max"), F.col("llr_u")))
        .cast("bigint")
        .alias("llr_final_u"),
        packed.alias("packed"),
    ).select(
        "n_users",
        "n_converted",
        "llr_final_u",
        F.coalesce(F.expr("packed div 2"), F.lit(0))
        .cast("bigint")
        .alias("first_cross_t"),
        F.when(F.col("packed").isNull(), 0)
        .when(F.col("packed") % 2 == 0, 1)
        .otherwise(-1)
        .cast("bigint")
        .alias("decision"),
    )


@register(
    "evt_benford_two_digit",
    oracle=f"""
    WITH exp_p(d2, p_u) AS (VALUES {", ".join(
        f"({d}, {p})" for d, p in _BENFORD2_U.items())}),
    v AS (
      SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                              AS VARCHAR), 1, 2) AS BIGINT) AS d2
      FROM events
      WHERE value IS NOT NULL
        AND CAST(round(value * 100) AS BIGINT) >= 10),
    c AS (
      SELECT d2, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY d2),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c)
    SELECT e.d2, CAST(coalesce(c.c, 0) AS BIGINT) AS c,
           CAST(e.p_u AS BIGINT) AS benford_p_u,
           n.n
    FROM exp_p e LEFT JOIN c ON c.d2 = e.d2 CROSS JOIN n
    """,
    description=(
        "first-two-digits Benford conformity table over event cent "
        "values (v ≥ 10 cents): observed counts for every d ∈ 10..99 "
        "— zero cells kept — next to the LITERAL micro-probability "
        "log₁₀(1+1/d) table (Python-computed, embedded identically "
        "in both engines; no log executes in either engine). The "
        "Nigrini forensic standard: fabricated or threshold-gamed "
        "numbers often pass the first-digit screen "
        "(evt_benford_audit) and fail the 90-cell two-digit fit; the "
        "gate assembles chi-square and MAD conformity and brute-"
        "forces every cell. Shape: map-side digit prefix + one "
        "90-cell aggregate + literal-table join"
    ),
    tags=("events", "audit", "statistics"),
)
def evt_benford_two_digit(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & (F.col("value_c") >= 10)
    )
    v = ev.select(
        F.substring(F.col("value_c").cast("string"), 1, 2)
        .cast("bigint")
        .alias("d2")
    )
    c = v.groupBy("d2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    exp_p = ev.sparkSession.createDataFrame(
        [(d, p) for d, p in _BENFORD2_U.items()],
        "d2 bigint, benford_p_u bigint",
    )
    n = c.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        # broadcast the RIGHT side (a left join can't build left)
        exp_p.join(F.broadcast(c), "d2", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d2",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
            "benford_p_u",
            "n",
        )
    )
