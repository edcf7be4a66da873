"""Round-6 continuation (batch f): rank statistics at scale and
corpus readability.

The scale story of this batch is the HISTOGRAM-RANK trick
(`evt_kruskal_wallis`): global ranks normally need a total order over
the fact table — a full sort that is banned in scale paths (SCALE.md
W7).  But midranks depend only on the VALUE HISTOGRAM: rank(v) =
(# smaller) + (count(v)+1)/2, so one value-grain aggregation plus a
cumulative window over the bounded value domain replaces the sort, and
per-group rank sums are conditional products over that same frame.
Doubled midranks (2·rank) keep every statistic integer until the final
identical-expression-tree division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "evt_kruskal_wallis",
    oracle=r"""
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS val,
             CAST(count(*) AS BIGINT) AS c,
             CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
             CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS c2,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS c3,
             CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS c4,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS c5
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(round(value * 100) AS BIGINT)),
    r AS (
      SELECT val, c, c1, c2, c3, c4, c5,
             2 * coalesce(sum(c) OVER (ORDER BY val
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) + c + 1 AS rr
      FROM v),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c3) AS BIGINT) AS n3, CAST(sum(c4) AS BIGINT) AS n4,
             CAST(sum(c5) AS BIGINT) AS n5,
             sum(CAST(c1 AS HUGEINT) * rr) AS rr1,
             sum(CAST(c2 AS HUGEINT) * rr) AS rr2,
             sum(CAST(c3 AS HUGEINT) * rr) AS rr3,
             sum(CAST(c4 AS HUGEINT) * rr) AS rr4,
             sum(CAST(c5 AS HUGEINT) * rr) AS rr5,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie_cubes
      FROM r),
    h AS (
      SELECT n, tie_cubes,
             ((((CAST(rr1 AS DOUBLE) / 2.0) * (CAST(rr1 AS DOUBLE) / 2.0)
                / CAST(n1 AS DOUBLE)
              + (CAST(rr2 AS DOUBLE) / 2.0) * (CAST(rr2 AS DOUBLE) / 2.0)
                / CAST(n2 AS DOUBLE))
              + (CAST(rr3 AS DOUBLE) / 2.0) * (CAST(rr3 AS DOUBLE) / 2.0)
                / CAST(n3 AS DOUBLE))
              + (CAST(rr4 AS DOUBLE) / 2.0) * (CAST(rr4 AS DOUBLE) / 2.0)
                / CAST(n4 AS DOUBLE))
              + (CAST(rr5 AS DOUBLE) / 2.0) * (CAST(rr5 AS DOUBLE) / 2.0)
                / CAST(n5 AS DOUBLE) AS sum_r2n
      FROM agg)
    SELECT n, CAST(5 AS BIGINT) AS k_groups,
           CAST(tie_cubes AS BIGINT) AS tie_cubes,
           (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
             * sum_r2n - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_raw,
           ((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
             * sum_r2n - 3.0 * (CAST(n AS DOUBLE) + 1.0))
           / (1.0 - CAST(tie_cubes AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
             AS h_corrected
    FROM h
    """,
    description="Kruskal-Wallis k-group rank test WITHOUT a global "
    "sort: midranks from the value-grain histogram (rank depends only "
    "on counts), doubled to stay integer; per-group rank sums as "
    "conditional products over the same frame; tie-corrected H via "
    "identical expression trees",
    tags=("events", "statistics"),
)
def evt_kruskal_wallis(spark, sf_dir):
    """k-group location test on ranks — the ANOVA alternative that
    needs no normality.

    The textbook computation ranks ALL n observations — a global sort
    of the fact table.  This implementation never sorts facts: midrank
    of value v is ``(# values < v) + (count(v)+1)/2``, a function of
    the VALUE HISTOGRAM alone, so the plan is one value-grain
    aggregation (bounded domain: 2-decimal cents), one cumulative
    window over that bounded frame, and one final aggregation whose
    per-group rank sums are conditional count×rank products.  Doubled
    midranks (``2C_<v + c_v + 1``) keep everything integer; the
    tie-cube term Σ(t³−t) falls out of the same histogram.  H and its
    tie correction are identical expression trees over the exact
    integers; the five R²/n terms are summed in explicit left-assoc
    order (k is static — no fold machinery needed, cf.
    `evt_anova_oneway`).

    Scale: the only fact-table pass is the histogram aggregation; all
    ranking happens on the |distinct values| frame.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    v = ev.groupBy(F.col("value_c").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        *[
            F.sum(F.when(F.col("event_type") == et, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i + 1}")
            for i, et in enumerate(_TYPES)
        ],
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    r = v.withColumn(
        "rr",
        2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1,
    )
    dec = "decimal(38,0)"
    agg = r.agg(
        F.sum("c").cast("bigint").alias("n"),
        *[
            F.sum(f"c{i + 1}").cast("bigint").alias(f"n{i + 1}")
            for i in range(5)
        ],
        *[
            F.sum((F.col(f"c{i + 1}").cast(dec) * F.col("rr")).cast(dec))
            .alias(f"rr{i + 1}")
            for i in range(5)
        ],
        F.sum(
            (F.col("c").cast(dec) * F.col("c") * F.col("c") - F.col("c"))
            .cast(dec)
        ).alias("tie_cubes"),
    )

    def r2n(i):
        rd = F.col(f"rr{i}").cast("double") / F.lit(2.0)
        return rd * rd / F.col(f"n{i}").cast("double")

    sum_r2n = ((((r2n(1) + r2n(2)) + r2n(3)) + r2n(4)) + r2n(5))
    nd = F.col("n").cast("double")
    h_raw = (F.lit(12.0) / (nd * (nd + F.lit(1.0)))) * sum_r2n - F.lit(
        3.0
    ) * (nd + F.lit(1.0))
    h = agg.withColumn("sum_r2n", sum_r2n)
    return h.select(
        "n",
        F.lit(5).cast("bigint").alias("k_groups"),
        F.col("tie_cubes").cast("bigint").alias("tie_cubes"),
        h_raw.alias("h_raw"),
        (
            h_raw
            / (
                F.lit(1.0)
                - F.col("tie_cubes").cast("double") / (nd * nd * nd - nd)
            )
        ).alias("h_corrected"),
    )


@register(
    "evt_friedman_test",
    oracle=r"""
    WITH ux AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x1,
             CAST(sum(CASE WHEN event_type = 'error'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x2,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x3,
             CAST(sum(CASE WHEN event_type = 'signup'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x4,
             CAST(sum(CASE WHEN event_type = 'view'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x5
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    rk AS (
      SELECT
        2 + 2*((x2<x1)::INT + (x3<x1)::INT + (x4<x1)::INT + (x5<x1)::INT)
          + (x2=x1)::INT + (x3=x1)::INT + (x4=x1)::INT + (x5=x1)::INT
          AS r1,
        2 + 2*((x1<x2)::INT + (x3<x2)::INT + (x4<x2)::INT + (x5<x2)::INT)
          + (x1=x2)::INT + (x3=x2)::INT + (x4=x2)::INT + (x5=x2)::INT
          AS r2,
        2 + 2*((x1<x3)::INT + (x2<x3)::INT + (x4<x3)::INT + (x5<x3)::INT)
          + (x1=x3)::INT + (x2=x3)::INT + (x4=x3)::INT + (x5=x3)::INT
          AS r3,
        2 + 2*((x1<x4)::INT + (x2<x4)::INT + (x3<x4)::INT + (x5<x4)::INT)
          + (x1=x4)::INT + (x2=x4)::INT + (x3=x4)::INT + (x5=x4)::INT
          AS r4,
        2 + 2*((x1<x5)::INT + (x2<x5)::INT + (x3<x5)::INT + (x4<x5)::INT)
          + (x1=x5)::INT + (x2=x5)::INT + (x3=x5)::INT + (x4=x5)::INT
          AS r5,
        (x1=x2)::INT + (x1=x3)::INT + (x1=x4)::INT + (x1=x5)::INT
          + (x2=x3)::INT + (x2=x4)::INT + (x2=x5)::INT
          + (x3=x4)::INT + (x3=x5)::INT + (x4=x5)::INT AS tie_pairs
      FROM ux),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r1) AS BIGINT) AS rr1,
             CAST(sum(r2) AS BIGINT) AS rr2,
             CAST(sum(r3) AS BIGINT) AS rr3,
             CAST(sum(r4) AS BIGINT) AS rr4,
             CAST(sum(r5) AS BIGINT) AS rr5,
             CAST(sum(tie_pairs) AS BIGINT) AS tie_pairs,
             sum(CAST(r1 AS HUGEINT)*r1 + CAST(r2 AS HUGEINT)*r2
                 + CAST(r3 AS HUGEINT)*r3 + CAST(r4 AS HUGEINT)*r4
                 + CAST(r5 AS HUGEINT)*r5) AS ss_rank4
      FROM rk)
    SELECT n, CAST(5 AS BIGINT) AS k_items, rr1, rr2, rr3, rr4, rr5,
           tie_pairs, CAST(ss_rank4 AS BIGINT) AS ss_rank4,
           (CAST(5 - 1 AS DOUBLE)
            * (((((CAST(rr1 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                   * (CAST(rr1 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                + (CAST(rr2 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                   * (CAST(rr2 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0))
                + (CAST(rr3 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                   * (CAST(rr3 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0))
                + (CAST(rr4 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                   * (CAST(rr4 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0))
                + (CAST(rr5 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)
                   * (CAST(rr5 AS DOUBLE)/2.0 - CAST(n AS DOUBLE)*3.0)))
           / (CAST(ss_rank4 AS DOUBLE)/4.0
              - CAST(n AS DOUBLE) * 5.0 * 9.0) AS q_stat
    FROM agg
    """,
    description="Friedman within-subject rank test over the 5 "
    "event-type items per user: midranks from explicit pairwise "
    "comparisons (k static), doubled to stay integer; tie-robust Q "
    "via the general ratio form with exact integer rank sums and "
    "rank-square sums",
    tags=("events", "statistics"),
)
def evt_friedman_test(spark, sf_dir):
    """Repeated-measures rank test (`evt_anova_oneway`'s within-subject
    sibling, `evt_cronbach_alpha`'s hypothesis-testing counterpart).

    Every user ranks the k=5 event-type items by their summed value;
    Friedman's Q asks whether the items differ systematically across
    users.  Within-user midranks come from explicit pairwise
    comparisons (k is static, so ``#less`` / ``#equal`` are 4+4
    comparisons per item — no sort, no explode); doubling keeps them
    integer (``2r = 2 + 2·#less + #eq``).  Q uses the tie-robust
    general form

        Q = (k−1)·Σ_g (R_g − n(k+1)/2)² / (Σ_{u,g} r_{u,g}² − nk(k+1)²/4)

    whose numerator/denominator components (rank sums 2R_g, rank-square
    sum Σ(2r)² = 4Σr²) are exact integers; with no ties it reduces to
    the textbook 12/(nk(k+1)) formula (property-tested both ways).

    Scale: one user-grain pivot aggregation (same shape as
    `evt_cronbach_alpha`), one row-local rank projection, one final
    aggregation.  Nothing exceeds the user frame.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    ux = ev.groupBy("user_id").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == et, F.col("value_c")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"x{i + 1}")
            for i, et in enumerate(_TYPES)
        ]
    )

    def rank2(g):
        others = [h for h in range(1, 6) if h != g]
        less = sum(
            F.when(F.col(f"x{h}") < F.col(f"x{g}"), 1).otherwise(0)
            for h in others
        )
        eq = sum(
            F.when(F.col(f"x{h}") == F.col(f"x{g}"), 1).otherwise(0)
            for h in others
        )
        return (F.lit(2) + 2 * less + eq).alias(f"r{g}")

    tie_pairs = sum(
        F.when(F.col(f"x{a}") == F.col(f"x{b}"), 1).otherwise(0)
        for a in range(1, 6)
        for b in range(a + 1, 6)
    ).alias("tie_pairs")
    rk = ux.select(*[rank2(g) for g in range(1, 6)], tie_pairs)
    dec = "decimal(38,0)"
    ss4 = sum(
        (F.col(f"r{g}").cast(dec) * F.col(f"r{g}")).cast(dec)
        for g in range(1, 6)
    )
    agg = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(f"r{g}").cast("bigint").alias(f"rr{g}")
            for g in range(1, 6)
        ],
        F.sum("tie_pairs").cast("bigint").alias("tie_pairs"),
        F.sum(ss4).alias("ss_rank4"),
    )
    nd = F.col("n").cast("double")

    def dev2(g):
        d = F.col(f"rr{g}").cast("double") / F.lit(2.0) - nd * F.lit(3.0)
        return d * d

    num = ((((dev2(1) + dev2(2)) + dev2(3)) + dev2(4)) + dev2(5))
    den = F.col("ss_rank4").cast("double") / F.lit(4.0) - nd * F.lit(
        5.0
    ) * F.lit(9.0)
    return agg.select(
        "n",
        F.lit(5).cast("bigint").alias("k_items"),
        "rr1", "rr2", "rr3", "rr4", "rr5",
        "tie_pairs",
        F.col("ss_rank4").cast("bigint").alias("ss_rank4"),
        (F.lit(4.0) * num / den).alias("q_stat"),
    )


@register(
    "doc_readability_scores",
    oracle=r"""
    WITH d AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS sylls
      FROM documents),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(words) AS BIGINT) AS words,
             CAST(sum(sents) AS BIGINT) AS sentences,
             CAST(sum(sylls) AS BIGINT) AS syllables
      FROM d GROUP BY source)
    SELECT source, n_docs, words, sentences, syllables,
           206.835 - 1.015 * (CAST(words AS DOUBLE)
                              / CAST(sentences AS DOUBLE))
                   - 84.6 * (CAST(syllables AS DOUBLE)
                             / CAST(words AS DOUBLE)) AS flesch_ease,
           0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
             - 15.59 AS fk_grade
    FROM g
    """,
    description="per-source readability: exact integer word / sentence "
    "/ vowel-group-syllable counts from regexp matching, Flesch "
    "reading ease and Flesch-Kincaid grade as identical expression "
    "trees over the aggregated integers",
    tags=("documents", "text", "quality"),
)
def doc_readability_scores(spark, sf_dir):
    """Corpus readability profiling (the curriculum/quality signal).

    Classic readability formulas need three counts per document —
    words (non-space runs), sentences (terminal-punctuation runs,
    floored at 1), syllables (approximated as vowel GROUPS, the
    standard cheap heuristic) — all exact integers from non-overlapping
    regexp matches, which Spark's ``regexp_count`` and DuckDB's
    ``len(regexp_extract_all(...))`` count identically.  Scores are
    computed per SOURCE over the summed counts (micro-average: the
    per-source totals, not a mean of per-doc ratios), as identical
    expression trees.

    Complements `doc_quality_profile` (length/punct/stopword gates)
    with the grade-level axis used in curriculum mixing.

    Scale: pure map + one source-grain aggregation; the regexes run
    in the JVM inside whole-stage codegen — no Python seam.
    """
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.regexp_count("text", F.lit(r"\S+")).cast("bigint").alias("words"),
        F.greatest(
            F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("bigint")
        .alias("sents"),
        F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+"))
        .cast("bigint")
        .alias("sylls"),
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sents").cast("bigint").alias("sentences"),
        F.sum("sylls").cast("bigint").alias("syllables"),
    )
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return g.select(
        "source", "n_docs", "words", "sentences", "syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )
