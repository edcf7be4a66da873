r"""Round-7 batch c: corpus-linguistics profile — the vocabulary-shape
diagnostics a training-data curator reads before fixing a sampling mix:
hapax mass (how much of the vocabulary is seen once), Heaps-law growth
(whether new vocabulary is still arriving as the corpus grows), Simpson
lexical concentration (repeat-token probability), and chunked
type-token ratio (local lexical diversity, the MTLD-lite readout).

All four run on the whitespace-normalized token stream (the exact
tokenization `operators/textops.py::tokens` and the doc dedup/minhash
suite share), reduce to integer counts before any division, and emit
ratios only as single identical expression trees.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.textops import tokens
from .common import t
from .registry import register

#: DuckDB fragment: one (doc_id, source, token) row per occurrence.
_SQL_TOK = r"""
    tok AS (
      SELECT doc_id, source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tk
      FROM documents),
    tok2 AS (SELECT doc_id, source, tk FROM tok WHERE length(tk) > 0)
"""


def _tok(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", F.explode(tokens("text")).alias("tk")
    ).filter(F.length("tk") > 0)


@register(
    "doc_hapax_ratio",
    oracle=f"""
    WITH {_SQL_TOK},
    tf AS (
      SELECT source, tk, CAST(count(*) AS BIGINT) AS c
      FROM tok2 GROUP BY source, tk)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS hapax_frac
    FROM tf GROUP BY source
    """,
    description=(
        "hapax-legomena profile per source: token mass, vocabulary "
        "size, once-seen vocabulary count, and the hapax fraction — "
        "the classic corpus-health readout (a high hapax fraction "
        "means tokenizer-hostile noise or genuinely fresh text; OCR "
        "garbage inflates it, boilerplate deflates it). Exact integer "
        "counts; the fraction is one identical division tree. Shape: "
        "one tokenize pass → per-(source,token) count → per-source "
        "fold, both map-side combined"
    ),
    tags=("documents", "text", "statistics"),
)
def doc_hapax_ratio(spark, sf_dir):
    tf = _tok(spark, sf_dir).groupBy("source", "tk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    one = F.when(F.col("c") == 1, 1).otherwise(0)
    return tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(one).cast("bigint").alias("hapax"),
        (
            F.sum(one).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("hapax_frac"),
    )


@register(
    "doc_heaps_law",
    oracle=f"""
    WITH {_SQL_TOK},
    bt AS (
      SELECT doc_id // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok2 GROUP BY doc_id // 50),
    fo AS (SELECT tk, min(doc_id) AS fd FROM tok2 GROUP BY tk),
    bv AS (
      SELECT fd // 50 AS bucket, CAST(count(*) AS BIGINT) AS new_vocab
      FROM fo GROUP BY fd // 50),
    j AS (
      SELECT coalesce(bt.bucket, bv.bucket) AS bucket,
             coalesce(bt.n_tokens, 0) AS n_tokens,
             coalesce(bv.new_vocab, 0) AS new_vocab
      FROM bt FULL JOIN bv ON bv.bucket = bt.bucket)
    SELECT CAST(bucket AS BIGINT) AS bucket, n_tokens, new_vocab,
           CAST(sum(n_tokens) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST(sum(new_vocab) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
    FROM j
    """,
    description=(
        "Heaps-law vocabulary growth curve: docs in 50-doc ingest "
        "buckets (doc_id order = arrival order), each token's FIRST "
        "occurrence attributed to the bucket of its min doc_id, then "
        "cumulative token mass vs cumulative vocabulary per bucket — "
        "the log-log slope of (cum_tokens, cum_vocab) is Heaps' beta, "
        "and a flattening curve is the empirical 'new data stopped "
        "adding vocabulary' signal that gates further crawling. All "
        "integer; the cumulative window runs over the BUCKET frame "
        "(|docs|/50 rows), not tokens. Shape: two aggregations over "
        "one tokenize lineage (per-bucket mass; per-token min then "
        "per-bucket count), a bucket-grain full join, one ordered "
        "integer window"
    ),
    tags=("documents", "text", "statistics"),
)
def doc_heaps_law(spark, sf_dir):
    tok = _tok(spark, sf_dir)
    bt = tok.groupBy(F.expr("doc_id div 50").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    fo = tok.groupBy("tk").agg(F.min("doc_id").alias("fd"))
    bv = fo.groupBy(F.expr("fd div 50").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_vocab")
    )
    j = (
        bt.join(bv, "bucket", "full")
        .select(
            "bucket",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("new_vocab"), F.lit(0)).alias("new_vocab"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_tokens",
        "new_vocab",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.sum("new_vocab").over(w).cast("bigint").alias("cum_vocab"),
    )


@register(
    "doc_simpson_diversity",
    oracle=f"""
    WITH {_SQL_TOK},
    tf AS (
      SELECT source, tk, CAST(count(*) AS BIGINT) AS c
      FROM tok2 GROUP BY source, tk)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c * (c - 1)) AS BIGINT) AS rep_pairs,
           CAST(sum(c * (c - 1)) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE))
             AS simpson_d
    FROM tf GROUP BY source
    """,
    description=(
        "Simpson lexical concentration per source: D = Σc(c−1) / "
        "(N(N−1)) is the exact probability two sampled token "
        "occurrences are the same type — the unbiased finite-sample "
        "form, so numerator and denominator are plain integers and D "
        "is one identical tree (1−D is the Gini-Simpson diversity). "
        "High D flags boilerplate-heavy sources before they dominate "
        "a sampling mix. Shape: identical two-fold aggregation as "
        "doc_hapax_ratio — per-(source,token) count, per-source fold"
    ),
    tags=("documents", "text", "statistics"),
)
def doc_simpson_diversity(spark, sf_dir):
    tf = _tok(spark, sf_dir).groupBy("source", "tk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.col("c") * (F.col("c") - 1))
        .cast("bigint")
        .alias("rep_pairs"),
        (
            F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
            / (
                F.sum("c").cast("double")
                * (F.sum("c") - 1).cast("double")
            )
        ).alias("simpson_d"),
    )


@register(
    "doc_ttr_chunks",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ',
                                         'g'), ' ') AS t
      FROM documents),
    pos AS (
      SELECT doc_id, source,
             generate_subscripts(t, 1) AS i, unnest(t) AS tk
      FROM toks),
    chunks AS (
      SELECT doc_id, source, (i - 1) // 50 AS chunk,
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(count(DISTINCT tk) AS BIGINT) AS n_types
      FROM pos WHERE length(tk) > 0
      GROUP BY doc_id, source, (i - 1) // 50)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_types) AS BIGINT) AS sum_types,
           CAST(sum(n_types) AS DOUBLE) / CAST(50 * count(*) AS DOUBLE)
             AS mean_ttr
    FROM chunks WHERE n_tok = 50
    GROUP BY source
    """,
    description=(
        "chunked type-token ratio per source (MTLD-lite): each doc's "
        "token stream is cut into fixed 50-token windows by POSITION "
        "(incomplete tails dropped, so every chunk has the same "
        "denominator and the mean TTR is Σtypes/(50·chunks) — one "
        "identical tree over two integers); plain whole-doc TTR is "
        "length-confounded, fixed windows are the standard correction. "
        "Low mean TTR = repetitive/templated text. Shape: a doc's "
        "tokens already sit co-located in ONE array cell, so every "
        "chunk summary (size + distinct count per 50-token slice) is "
        "computed MAP-SIDE with array HOFs — nothing shuffles but the "
        "per-source integer fold (an exploded countDistinct first cut "
        "shuffled the whole token stream and probed 2.9× at sf1; this "
        "form is 1 exchange and flat)"
    ),
    tags=("documents", "text", "statistics"),
)
def doc_ttr_chunks(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    chunk_stats = F.expr(
        """
        transform(sequence(0, (size(tks) - 1) div 50),
          i -> struct(
            size(filter(slice(tks, i*50 + 1, 50),
                        tk -> length(tk) > 0)) AS n_tok,
            size(array_distinct(filter(slice(tks, i*50 + 1, 50),
                        tk -> length(tk) > 0))) AS n_types))
        """
    )
    chunks = (
        docs.select("source", tokens("text").alias("tks"))
        .select("source", F.explode(chunk_stats).alias("c"))
        .select("source", "c.n_tok", "c.n_types")
    )
    return (
        chunks.filter(F.col("n_tok") == 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_types").cast("bigint").alias("sum_types"),
            (
                F.sum("n_types").cast("double")
                / (50 * F.count(F.lit(1))).cast("double")
            ).alias("mean_ttr"),
        )
    )
