"""Round-6 continuation (batch g): paired and post-hoc inference.

Completes the classical-testing suite (`evt_anova_oneway`,
`evt_kruskal_wallis`, `evt_friedman_test`, `evt_welch_ttest`) with the
post-hoc pairwise layer (Tukey-Kramer) and the paired designs
(Wilcoxon signed-rank, McNemar, Cohen's kappa).  Determinism per the
registry contract: exact integer sufficient statistics; k-static
left-assoc double sums; the signed-rank test reuses the
HISTOGRAM-RANK trick from `evt_kruskal_wallis` (midranks of |diff|
from the |diff|-grain histogram — no sort of the paired frame).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_TYPES = ["click", "error", "purchase", "signup", "view"]

_G = {et: i + 1 for i, et in enumerate(_TYPES)}

#: per-type conditional aggregate cells, shared by the oracle text
_CELLS_SQL = ",\n             ".join(
    f"CAST(count(*) FILTER (event_type = '{et}') AS BIGINT) AS n{i + 1},\n"
    f"             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)) "
    f"FILTER (event_type = '{et}'), 0) AS BIGINT) AS s{i + 1},\n"
    f"             coalesce(sum(CAST(CAST(round(value * 100) AS BIGINT)"
    f" * CAST(round(value * 100) AS BIGINT) AS HUGEINT))"
    f" FILTER (event_type = '{et}'), 0) AS q{i + 1}"
    for i, et in enumerate(_TYPES)
)

_SSW_SQL = " - ".join(
    ["CAST(q1 + q2 + q3 + q4 + q5 AS DOUBLE)"]
    + [
        f"CAST(s{g} AS DOUBLE) * CAST(s{g} AS DOUBLE) / CAST(n{g} AS DOUBLE)"
        for g in range(1, 6)
    ]
)

_PAIR_BRANCHES_SQL = "\n      UNION ALL\n".join(
    f"""      SELECT '{a}' AS type_a, '{b}' AS type_b,
             n{_G[a]} AS n_a, n{_G[b]} AS n_b,
             s{_G[a]} AS sum_a_c, s{_G[b]} AS sum_b_c,
             CAST(s{_G[a]} AS DOUBLE) / CAST(n{_G[a]} AS DOUBLE)
               - CAST(s{_G[b]} AS DOUBLE) / CAST(n{_G[b]} AS DOUBLE)
               AS mean_diff_c,
             abs(CAST(s{_G[a]} AS DOUBLE) / CAST(n{_G[a]} AS DOUBLE)
                 - CAST(s{_G[b]} AS DOUBLE) / CAST(n{_G[b]} AS DOUBLE))
             / sqrt(msw / 2.0 * (1.0 / CAST(n{_G[a]} AS DOUBLE)
                                 + 1.0 / CAST(n{_G[b]} AS DOUBLE)))
               AS q_stat
      FROM m"""
    for a, b in combinations(_TYPES, 2)
)


@register(
    "evt_tukey_pairs",
    oracle=rf"""
    WITH g AS (
      SELECT {_CELLS_SQL},
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT *,
             ({_SSW_SQL}) / (CAST(n AS DOUBLE) - 5.0) AS msw
      FROM g)
{_PAIR_BRANCHES_SQL}
    """,
    description="Tukey-Kramer post-hoc pairs after the one-way ANOVA: "
    "all 10 event-type pairs with exact integer (n, sum) components, "
    "mean differences and studentized-range q statistics from "
    "identical expression trees over one single-pass aggregation",
    tags=("events", "statistics"),
)
def evt_tukey_pairs(spark, sf_dir):
    """Which groups differ — the post-hoc layer over `evt_anova_oneway`.

    One pass over the fact table aggregates every per-type sufficient
    statistic (n_g, Σx, Σx² — 16 cells); MSW falls out as
    ``(ΣQ − Σ S_g²/n_g)/(n−k)`` with the k-term sum in static
    left-assoc order, and the 10 pairwise rows are a posexplode of
    literal pair structs over the single aggregated row — no join, no
    second scan.  q_ij = |mean_i − mean_j| / sqrt(MSW/2·(1/n_i+1/n_j))
    (the Tukey-Kramer unequal-n form); critical-value lookup is the
    consumer's (it is a table constant, not data).

    Scale: exactly the `evt_anova_oneway` plan plus a 10-row explode.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    dec = "decimal(38,0)"
    cells = []
    for i, et in enumerate(_TYPES):
        is_g = F.col("event_type") == et
        cells.append(
            F.sum(F.when(is_g, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{i + 1}")
        )
        cells.append(
            F.sum(F.when(is_g, F.col("value_c")).otherwise(0))
            .cast("bigint")
            .alias(f"s{i + 1}")
        )
        cells.append(
            F.sum(
                F.when(
                    is_g,
                    (F.col("value_c").cast(dec) * F.col("value_c")).cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            ).alias(f"q{i + 1}")
        )
    g = ev.agg(*cells, F.count(F.lit(1)).cast("bigint").alias("n"))
    ssw = (
        (F.col("q1") + F.col("q2") + F.col("q3") + F.col("q4") + F.col("q5"))
        .cast("double")
    )
    for gi in range(1, 6):
        ssw = ssw - (
            F.col(f"s{gi}").cast("double")
            * F.col(f"s{gi}").cast("double")
            / F.col(f"n{gi}").cast("double")
        )
    m = g.withColumn(
        "msw", ssw / (F.col("n").cast("double") - F.lit(5.0))
    )

    def pair_struct(a, b):
        ia, ib = _G[a], _G[b]
        mean_diff = F.col(f"s{ia}").cast("double") / F.col(
            f"n{ia}"
        ).cast("double") - F.col(f"s{ib}").cast("double") / F.col(
            f"n{ib}"
        ).cast("double")
        q = F.abs(mean_diff) / F.sqrt(
            F.col("msw")
            / F.lit(2.0)
            * (
                F.lit(1.0) / F.col(f"n{ia}").cast("double")
                + F.lit(1.0) / F.col(f"n{ib}").cast("double")
            )
        )
        return F.struct(
            F.lit(a).alias("type_a"),
            F.lit(b).alias("type_b"),
            F.col(f"n{ia}").alias("n_a"),
            F.col(f"n{ib}").alias("n_b"),
            F.col(f"s{ia}").alias("sum_a_c"),
            F.col(f"s{ib}").alias("sum_b_c"),
            mean_diff.alias("mean_diff_c"),
            q.alias("q_stat"),
        )

    pairs = m.select(
        F.explode(
            F.array(*[pair_struct(a, b) for a, b in combinations(_TYPES, 2)])
        ).alias("p")
    )
    return pairs.select("p.*")


@register(
    "evt_wilcoxon_signed_rank",
    oracle=r"""
    WITH u AS (
      SELECT user_id,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (CAST(day(ts) AS INT) <= 15), 0) AS BIGINT)
               - CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (CAST(day(ts) AS INT) > 15), 0) AS BIGINT) AS diff
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    nz AS (
      SELECT abs(diff) AS ad,
             CAST(count(*) AS BIGINT) AS c,
             CAST(count(*) FILTER (diff > 0) AS BIGINT) AS pos
      FROM u WHERE diff <> 0 GROUP BY abs(diff)),
    r AS (
      SELECT ad, c, pos,
             2 * coalesce(sum(c) OVER (ORDER BY ad
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) + c + 1 AS rr
      FROM nz),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(pos * rr) AS BIGINT) AS w_plus2,
             CAST(sum((c - pos) * rr) AS BIGINT) AS w_minus2,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS BIGINT)
               AS tie_cubes
      FROM r)
    SELECT n, w_plus2, w_minus2, tie_cubes,
           (CAST(w_plus2 AS DOUBLE) / 2.0
             - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
           / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                  * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                  - CAST(tie_cubes AS DOUBLE) / 48.0) AS z
    FROM agg
    """,
    description="Wilcoxon signed-rank test of first-half vs second-half "
    "monthly spend per user: zero diffs dropped, |diff| midranks from "
    "the histogram-rank trick (no sort), doubled rank sums and tie "
    "cubes exact integers, tie-corrected z via identical trees",
    tags=("events", "statistics"),
)
def evt_wilcoxon_signed_rank(spark, sf_dir):
    """Paired location test — did per-user spend shift mid-month?

    Pairs are (days 1-15, days 16+) per user; the test ranks |diff|
    across users and compares the positive-diff rank sum W⁺ to its
    null mean n(n+1)/4.  Ranking reuses the histogram-rank identity
    from `evt_kruskal_wallis` — midrank(|d|) depends only on the
    |diff| histogram — so the USER frame is never sorted either: one
    user-grain aggregation, one |diff|-grain aggregation, one
    cumulative window over the bounded |diff| domain.  Doubled
    midranks keep W⁺, W⁻, and the tie-cube correction integer
    (W⁺+W⁻ = n(n+1)/2 is asserted by the property gate); z applies the
    standard tie-corrected variance as one identical expression tree.

    Scale: the fact table is touched once; everything else is
    aggregate-frame sized.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    first_half = F.dayofmonth("ts") <= 15
    u = ev.groupBy("user_id").agg(
        (
            F.coalesce(
                F.sum(F.when(first_half, F.col("value_c"))), F.lit(0)
            )
            - F.coalesce(
                F.sum(F.when(~first_half, F.col("value_c"))), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("diff")
    )
    nz = (
        u.filter(F.col("diff") != 0)
        .groupBy(F.abs("diff").alias("ad"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("pos"),
        )
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    r = nz.withColumn(
        "rr",
        2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1,
    )
    dec = "decimal(38,0)"
    agg = r.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("pos") * F.col("rr")).cast("bigint").alias("w_plus2"),
        F.sum((F.col("c") - F.col("pos")) * F.col("rr"))
        .cast("bigint")
        .alias("w_minus2"),
        F.sum(
            (F.col("c").cast(dec) * F.col("c") * F.col("c") - F.col("c"))
            .cast(dec)
        )
        .cast("bigint")
        .alias("tie_cubes"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "n", "w_plus2", "w_minus2", "tie_cubes",
        (
            (
                F.col("w_plus2").cast("double") / F.lit(2.0)
                - nd * (nd + F.lit(1.0)) / F.lit(4.0)
            )
            / F.sqrt(
                nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0))
                / F.lit(24.0)
                - F.col("tie_cubes").cast("double") / F.lit(48.0)
            )
        ).alias("z"),
    )


@register(
    "evt_mcnemar_test",
    oracle=r"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase'
                      AND CAST(day(ts) AS INT) <= 15
                      THEN 1 ELSE 0 END) AS p1,
             max(CASE WHEN event_type = 'purchase'
                      AND CAST(day(ts) AS INT) > 15
                      THEN 1 ELSE 0 END) AS p2
      FROM events GROUP BY user_id),
    c AS (
      SELECT CAST(sum(p1 * p2) AS BIGINT) AS both_yes,
             CAST(sum(p1 * (1 - p2)) AS BIGINT) AS only_first,
             CAST(sum((1 - p1) * p2) AS BIGINT) AS only_second,
             CAST(sum((1 - p1) * (1 - p2)) AS BIGINT) AS both_no
      FROM u)
    SELECT both_yes, only_first, only_second, both_no,
           CASE WHEN only_first + only_second > 0
                THEN CAST((only_first - only_second)
                          * (only_first - only_second) AS DOUBLE)
                     / CAST(only_first + only_second AS DOUBLE)
                ELSE 0.0 END AS chi2,
           CASE WHEN only_first + only_second > 0
                THEN (abs(CAST(only_first AS DOUBLE)
                          - CAST(only_second AS DOUBLE)) - 1.0)
                     * (abs(CAST(only_first AS DOUBLE)
                            - CAST(only_second AS DOUBLE)) - 1.0)
                     / CAST(only_first + only_second AS DOUBLE)
                ELSE 0.0 END AS chi2_cc
    FROM c
    """,
    description="McNemar's paired-proportion test: did each user "
    "purchase in the first vs second half of the month - exact 2x2 "
    "discordant-pair counts, chi-square with and without continuity "
    "correction via identical trees",
    tags=("events", "statistics"),
)
def evt_mcnemar_test(spark, sf_dir):
    """Paired binary outcomes — conversion before vs after mid-month.

    The within-subject sibling of `evt_proportion_ztest`: each user
    contributes one (before, after) purchase-flag pair, and only the
    DISCORDANT cells (converted in exactly one half) carry information
    — χ² = (b−c)²/(b+c), plus Edwards' continuity-corrected form.
    All four 2×2 cells are exact integers from one user-grain
    aggregation; both statistics are identical expression trees.

    Scale: one fact pass, one user-grain agg, single-row math.
    """
    ev = keyed_events(spark, sf_dir)
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(is_p & (F.dayofmonth("ts") <= 15), 1).otherwise(0)
        ).alias("p1"),
        F.max(
            F.when(is_p & (F.dayofmonth("ts") > 15), 1).otherwise(0)
        ).alias("p2"),
    )
    c = u.agg(
        F.sum(F.col("p1") * F.col("p2")).cast("bigint").alias("both_yes"),
        F.sum(F.col("p1") * (1 - F.col("p2")))
        .cast("bigint")
        .alias("only_first"),
        F.sum((1 - F.col("p1")) * F.col("p2"))
        .cast("bigint")
        .alias("only_second"),
        F.sum((1 - F.col("p1")) * (1 - F.col("p2")))
        .cast("bigint")
        .alias("both_no"),
    )
    b, cc = F.col("only_first"), F.col("only_second")
    disc = (b + cc).cast("double")
    chi2 = F.when(
        b + cc > 0,
        ((b - cc) * (b - cc)).cast("double") / disc,
    ).otherwise(F.lit(0.0))
    absd = F.abs(b.cast("double") - cc.cast("double"))
    chi2_cc = F.when(
        b + cc > 0,
        (absd - F.lit(1.0)) * (absd - F.lit(1.0)) / disc,
    ).otherwise(F.lit(0.0))
    return c.select(
        "both_yes", "only_first", "only_second", "both_no",
        chi2.alias("chi2"),
        chi2_cc.alias("chi2_cc"),
    )


@register(
    "evt_cohens_kappa",
    oracle=r"""
    WITH u AS (
      SELECT user_id,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS total_c,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    r AS (
      SELECT user_id,
             (row_number() OVER (ORDER BY total_c DESC, user_id)
               <= count(*) OVER () // 2) AS heavy_by_value,
             (row_number() OVER (ORDER BY n_events DESC, user_id)
               <= count(*) OVER () // 2) AS heavy_by_count
      FROM u),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN heavy_by_value AND heavy_by_count
                  THEN 1 ELSE 0 END) AS BIGINT) AS yy,
             CAST(sum(CASE WHEN heavy_by_value AND NOT heavy_by_count
                  THEN 1 ELSE 0 END) AS BIGINT) AS yn,
             CAST(sum(CASE WHEN NOT heavy_by_value AND heavy_by_count
                  THEN 1 ELSE 0 END) AS BIGINT) AS ny,
             CAST(sum(CASE WHEN NOT heavy_by_value AND NOT heavy_by_count
                  THEN 1 ELSE 0 END) AS BIGINT) AS nn
      FROM r)
    SELECT n, yy, yn, ny, nn,
           (CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
               + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (1.0 - (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
                     + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
    FROM c
    """,
    description="Cohen's kappa agreement between two 'heavy user' "
    "raters (top half by total value vs top half by event count, "
    "deterministic tie-breaks): exact 2x2 integers, chance-corrected "
    "agreement via identical trees",
    tags=("events", "statistics"),
)
def evt_cohens_kappa(spark, sf_dir):
    """Do two reasonable definitions of 'heavy user' agree?

    Rater A labels the top half of users by TOTAL VALUE, rater B by
    EVENT COUNT (both with (metric, user_id) tie-breaks so the label
    sets are exact halves, deterministically).  κ = (p_o − p_e)/(1−p_e)
    corrects raw agreement for the agreement two independent raters
    with these marginals would produce by chance — the standard
    label-quality / annotator-consistency metric for training-data
    curation.  All 2×2 cells are exact integers; κ is one identical
    expression tree.

    Scale: one fact pass to the user frame; the two ranking windows
    run over the AGGREGATE frame (|users| rows) — acceptable per the
    W7 rule's aggregate-frame carve-out, same as `evt_user_skyline`.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum("value_c"), F.lit(0))
        .cast("bigint")
        .alias("total_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    half = F.expr("count(*) OVER () DIV 2")
    r = u.select(
        "user_id",
        (
            F.row_number().over(
                Window.orderBy(F.desc("total_c"), F.asc("user_id"))
            )
            <= half
        ).alias("heavy_by_value"),
        (
            F.row_number().over(
                Window.orderBy(F.desc("n_events"), F.asc("user_id"))
            )
            <= half
        ).alias("heavy_by_count"),
    )
    hv, hc = F.col("heavy_by_value"), F.col("heavy_by_count")
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(hv & hc, 1).otherwise(0)).cast("bigint").alias("yy"),
        F.sum(F.when(hv & ~hc, 1).otherwise(0)).cast("bigint").alias("yn"),
        F.sum(F.when(~hv & hc, 1).otherwise(0)).cast("bigint").alias("ny"),
        F.sum(F.when(~hv & ~hc, 1).otherwise(0)).cast("bigint").alias("nn"),
    )
    nd = F.col("n").cast("double")
    pe = (
        (F.col("yy") + F.col("yn")).cast("double")
        * (F.col("yy") + F.col("ny")).cast("double")
        + (F.col("ny") + F.col("nn")).cast("double")
        * (F.col("yn") + F.col("nn")).cast("double")
    ) / (nd * nd)
    po = (F.col("yy") + F.col("nn")).cast("double") / nd
    return c.select(
        "n", "yy", "yn", "ny", "nn",
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )
