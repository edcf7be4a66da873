"""Round-10c batch: the Gopher quality-rule audit and the hubness
diagnostic — one per side of a training-data pipeline (text curation /
embedding retrieval).

``doc_gopher_rules`` — the published Gopher corpus-filter rule set
(Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1) run as
a per-source audit table: word-count bounds [50, 100000], mean word
length bounds [3, 10], ≥80% of words containing an alphabetic
character, and ≥2 distinct words from the 8-word stop list (the
"closed-class check"). `doc_quality_profile` SCORES documents on ad
hoc ratios and `doc_filter_waterfall` ablates a generic stack; this is
the NAMED public rule set with its published thresholds, reported as
orthogonal per-rule failure counts plus the all-rules survivor count —
the table a curation run publishes per source shard. On this synthetic
word-soup fixture the stop-list rule rejects everything (≤1 distinct
stop word per doc — measured) and the alpha rule rejects nothing;
that's the honest read-out, and the gate pins those degeneracies
alongside the discriminating word-count rule.

``emb_hubness`` — the k-occurrence distribution N_k: for a LITERAL
query panel (vec_id < 64), each query's exact top-5 neighbors by
integer L2; then for every corpus vector, how many query lists it
appears in. High-dimensional spaces concentrate: a few "hub" vectors
appear in many k-NN lists while most appear in none (Radovanović et
al. 2010) — hubness skew degrades k-NN label propagation and
dedup-by-NN long before recall metrics notice. Output is the exact
histogram over N_k ≥ 1; the gate pins Σ occ·count = |queries|·k and
assembles the skew.

Determinism: tokens are whitespace splits of normalized text; every
rule is an integer cross-multiplication (3·n_w ≤ Σlen ≤ 10·n_w,
5·n_alpha ≥ 4·n_w); embedding coordinates quantize to integer millis
before the L2 sums; top-5 ties break on neighbor_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

#: Gopher stop list (Rae et al. 2021 §A1.1) — a LITERAL in both engines
_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_WC_MIN, _WC_MAX = 50, 100000
_MWL_MIN, _MWL_MAX = 3, 10  # mean word length bounds
_HUB_QUERIES = 64
_HUB_K = 5


@register(
    "doc_gopher_rules",
    oracle=rf"""
    WITH d AS (
      SELECT source,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         w -> w <> '') AS ws
      FROM documents),
    m AS (
      SELECT source,
             len(ws) AS n_w,
             coalesce(list_sum(list_transform(ws, w -> len(w))), 0)
               AS sum_len,
             len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
               AS n_alpha,
             len(list_filter([{", ".join(f"'{s}'" for s in _STOPS)}],
                             s -> list_contains(ws, s))) AS n_stop
      FROM d),
    r AS (
      SELECT source,
             CASE WHEN n_w BETWEEN {_WC_MIN} AND {_WC_MAX}
                  THEN 1 ELSE 0 END AS r_wc,
             CASE WHEN {_MWL_MIN} * n_w <= sum_len
                   AND sum_len <= {_MWL_MAX} * n_w
                  THEN 1 ELSE 0 END AS r_mwl,
             CASE WHEN 5 * n_alpha >= 4 * n_w THEN 1 ELSE 0 END
               AS r_alpha,
             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
      FROM m)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - r_wc) AS BIGINT) AS fail_word_count,
           CAST(sum(1 - r_mwl) AS BIGINT) AS fail_mean_word_len,
           CAST(sum(1 - r_alpha) AS BIGINT) AS fail_alpha_frac,
           CAST(sum(1 - r_stop) AS BIGINT) AS fail_stop_words,
           CAST(sum(r_wc * r_mwl * r_alpha * r_stop) AS BIGINT)
             AS n_pass_all
    FROM r GROUP BY source
    """,
    description=(
        "the published Gopher quality-rule set as a per-source audit: "
        f"word count in [{_WC_MIN}, {_WC_MAX}], mean word length in "
        f"[{_MWL_MIN}, {_MWL_MAX}] (integer cross-multiplied "
        "3·n ≤ Σlen ≤ 10·n), ≥80% alphabetic words (5·n_alpha ≥ 4·n), "
        "≥2 distinct stop-list words — orthogonal per-rule failure "
        "counts + the all-rules survivor count per source, the shard "
        "report a curation run publishes. Shape: one map-side "
        "token-array pass (stop list is an 8-element literal), one "
        "source fold"
    ),
    tags=("documents", "text", "quality"),
)
def doc_gopher_rules(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    ws = F.expr("filter(ws, w -> w <> '')")
    m = docs.select(
        "source", tokens("text").alias("ws")
    ).select(
        "source",
        F.size(ws).alias("n_w"),
        F.coalesce(
            F.expr(
                "aggregate(filter(ws, w -> w <> ''), "
                "cast(0 as bigint), (acc, w) -> acc + length(w))"
            ),
            F.lit(0),
        ).alias("sum_len"),
        F.size(
            F.expr("filter(ws, w -> w <> '' and w rlike '[a-z]')")
        ).alias("n_alpha"),
        F.size(
            F.expr(
                "filter(array("
                + ", ".join(f"'{s}'" for s in _STOPS)
                + "), s -> array_contains(ws, s))"
            )
        ).alias("n_stop"),
    )
    r_wc = (
        (F.col("n_w") >= _WC_MIN) & (F.col("n_w") <= _WC_MAX)
    ).cast("int")
    r_mwl = (
        (_MWL_MIN * F.col("n_w") <= F.col("sum_len"))
        & (F.col("sum_len") <= _MWL_MAX * F.col("n_w"))
    ).cast("int")
    r_alpha = (5 * F.col("n_alpha") >= 4 * F.col("n_w")).cast("int")
    r_stop = (F.col("n_stop") >= 2).cast("int")
    r = m.select(
        "source",
        r_wc.alias("r_wc"),
        r_mwl.alias("r_mwl"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(1 - F.col("r_wc")).cast("bigint").alias("fail_word_count"),
        F.sum(1 - F.col("r_mwl"))
        .cast("bigint")
        .alias("fail_mean_word_len"),
        F.sum(1 - F.col("r_alpha"))
        .cast("bigint")
        .alias("fail_alpha_frac"),
        F.sum(1 - F.col("r_stop")).cast("bigint").alias("fail_stop_words"),
        F.sum(
            F.col("r_wc")
            * F.col("r_mwl")
            * F.col("r_alpha")
            * F.col("r_stop")
        )
        .cast("bigint")
        .alias("n_pass_all"),
    )


@register(
    "emb_hubness",
    oracle=f"""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT)
               AS x
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             sum((c.x - q.x) * (c.x - q.x)) AS d2
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE q.vec_id < {_HUB_QUERIES} AND c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    topk AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY d2, cid)
                 AS rn
        FROM pairs) WHERE rn <= {_HUB_K}),
    kocc AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS k_occ
      FROM topk GROUP BY cid)
    SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vectors
    FROM kocc GROUP BY k_occ
    """,
    description=(
        "hubness diagnostic: exact top-"
        f"{_HUB_K} integer-L2 neighbor lists for a {_HUB_QUERIES}-query "
        "literal panel, folded into the k-occurrence histogram (how "
        "many query lists each corpus vector appears in) — the "
        "Radovanović skew that silently degrades k-NN label "
        "propagation and NN-dedup in high dimensions; the gate pins "
        "Σ k_occ·n_vectors = queries·k and assembles the skew. Shape: "
        "bounded query panel broadcast against ONE corpus scan, "
        "per-query top-k window on the query-partitioned frame, two "
        "small folds"
    ),
    tags=("embeddings", "ann", "diagnostics"),
)
def emb_hubness(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("q")
    )
    queries = emb.filter(F.col("vec_id") < _HUB_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    d2 = pairs.select(
        "qid",
        F.col("vec_id").alias("cid"),
        _int_d2_arr(F.col("qv"), F.col("q")).alias("d2"),
    )
    topk = (
        d2.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cid")
            ),
        )
        .filter(F.col("rn") <= _HUB_K)
        .select("qid", "cid")
    )
    kocc = topk.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_occ")
    )
    return kocc.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
