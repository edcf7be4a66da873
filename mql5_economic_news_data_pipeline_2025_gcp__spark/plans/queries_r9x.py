"""Round-9 batch x: rank-biased overlap between source vocabularies.

``doc_rbo_term_ranks`` — the matched-rank table behind Rank-Biased
Overlap (Webber 2010) between the two largest sources' top-50 term
rankings: for every term in BOTH top-50 lists, its rank in each.  RBO
is THE comparison metric for indefinite rankings (search results,
vocabulary heads, feature importances): top-weighted via the p^{d−1}
geometric decay, defined even when the lists disagree on membership —
where Kendall/Spearman (`evt_kendall_tau_matrix`,
`evt_spearman_view_purchase`) need a shared support.  The gate
assembles extrapolated RBO at p = 0.9 from the emitted rank pairs and
pins its [0, 1] range; a drift monitor alarms when the head
vocabulary's RBO between a source and its trailing week drops.

Determinism: term ranks use the (count DESC, term ASC) total order of
the corpus convention; only BIGINT ranks/counts are emitted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register

_SRC_A, _SRC_B = "src0", "src1"
_DEPTH = 50


@register(
    "doc_rbo_term_ranks",
    oracle=rf"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(regexp_replace(lower(trim(text)),
                                                '\s+', ' ', 'g'), ' '))
               AS w
      FROM documents WHERE source IN ('{_SRC_A}', '{_SRC_B}')),
    tc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE w <> '' GROUP BY source, w),
    r AS (
      SELECT source, w, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, w ASC) AS rnk
      FROM tc),
    top AS (SELECT source, w, c, rnk FROM r WHERE rnk <= {_DEPTH})
    SELECT a.w AS term,
           CAST(a.rnk AS BIGINT) AS rank_a,
           CAST(b.rnk AS BIGINT) AS rank_b,
           CAST(a.c AS BIGINT) AS c_a,
           CAST(b.c AS BIGINT) AS c_b
    FROM top a JOIN top b ON a.w = b.w
    WHERE a.source = '{_SRC_A}' AND b.source = '{_SRC_B}'
    """,
    description=(
        f"Rank-Biased Overlap matched-rank table between {_SRC_A} and "
        f"{_SRC_B} top-{_DEPTH} term rankings: per shared term, its "
        "rank and count in each source under the (count DESC, term "
        "ASC) total order. The gate assembles extrapolated RBO at "
        "p = 0.9 — overlap at each depth from the rank pairs, "
        "geometric top-weighting — and pins RBO ∈ [0, 1]; the "
        "ranking-comparison metric that works on indefinite, "
        "partially-disjoint lists where rank correlations need "
        "shared support. Vocabulary-drift monitoring reads this "
        "between a source and its trailing window. Shape: one "
        "(source, term) count (map-side combined), rank windows over "
        "two source frames, one ≤50×50 self-join — everything after "
        "the count is head-sized"
    ),
    tags=("documents", "text", "drift"),
)
def doc_rbo_term_ranks(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(
        spark,
        t(spark, sf_dir, "documents").filter(
            F.col("source").isin(_SRC_A, _SRC_B)
        ),
    )
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    tc = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_rnk = Window.partitionBy("source").orderBy(
        F.desc("c"), F.asc("w")
    )
    top = (
        tc.withColumn("rnk", F.row_number().over(w_rnk))
        .filter(F.col("rnk") <= _DEPTH)
        .localCheckpoint()  # ≤2·DEPTH rows; feeds both join sides
    )
    a = top.filter(F.col("source") == _SRC_A).select(
        F.col("w").alias("term"),
        F.col("rnk").alias("rank_a"),
        F.col("c").alias("c_a"),
    )
    b = top.filter(F.col("source") == _SRC_B).select(
        F.col("w").alias("term_b"),
        F.col("rnk").alias("rank_b"),
        F.col("c").alias("c_b"),
    )
    return a.join(
        F.broadcast(b), a["term"] == b["term_b"]
    ).select(
        "term",
        F.col("rank_a").cast("bigint").alias("rank_a"),
        F.col("rank_b").cast("bigint").alias("rank_b"),
        F.col("c_a").cast("bigint").alias("c_a"),
        F.col("c_b").cast("bigint").alias("c_b"),
    )
