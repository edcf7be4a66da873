"""Round-9 batch b: corpus-curation signals at the CHARACTER level and
the C4-style blocklist pass.

``doc_char_bigram_entropy`` — per-source character unigram/bigram
entropy sufficient statistics.  Conditional character entropy
H(c_i | c_{i-1}) = H₂ − H₁ is the classic gibberish/OCR-noise detector:
natural text sits in a narrow band, mojibake and binary-leak pages jump
out — a curation signal none of the token-level ops (token entropy,
quality profile, readability) can see because it works below the
tokenizer.

``doc_blocklist_filter`` — the C4-style blocked-word pass: per source,
how many documents a literal blocklist flags, the total instance count,
and what survives — the first waterfall stage of every web-corpus
recipe, as a standalone auditable readout.

Determinism: counts are integers; per-gram c·ln(c) entropy terms are
micro-nat quantized and the sums ride the 2²⁰ hi/lo BIGINT halves
(round-9 render-safe cut); keep-rates are floored basis points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register

_LN_U = 1000000
_HALF = 1048576

#: literal blocked-word list (C4-style badword pass; corpus-matched so
#: all three outcomes occur: common hit, rare hit, zero hit)
_BLOCKLIST = ("slow", "dup", "legacy")


@register(
    "doc_char_bigram_entropy",
    oracle=f"""
    WITH g AS (
      SELECT source, 'u' AS kind,
             unnest(list_transform(range(1, length(text) + 1),
                                   i -> substr(text, i, 1))) AS gram
      FROM documents WHERE length(text) >= 2
      UNION ALL
      SELECT source, 'b',
             unnest(list_transform(range(1, length(text)),
                                   i -> substr(text, i, 2)))
      FROM documents WHERE length(text) >= 2),
    c AS (
      SELECT source, kind, gram, CAST(count(*) AS BIGINT) AS c
      FROM g GROUP BY 1, 2, 3),
    tm AS (
      SELECT source, kind, c,
             c * CAST(round(ln(CAST(c AS DOUBLE)) * {_LN_U}) AS BIGINT)
               AS term
      FROM c)
    SELECT source,
           CAST(sum(CASE WHEN kind = 'u' THEN c ELSE 0 END) AS BIGINT)
             AS n_uni,
           CAST(sum(CASE WHEN kind = 'b' THEN c ELSE 0 END) AS BIGINT)
             AS n_big,
           CAST(sum(CASE WHEN kind = 'u' THEN 1 ELSE 0 END) AS BIGINT)
             AS u_distinct,
           CAST(sum(CASE WHEN kind = 'b' THEN 1 ELSE 0 END) AS BIGINT)
             AS b_distinct,
           CAST(sum(CASE WHEN kind = 'u' THEN term // {_HALF} ELSE 0 END)
                AS BIGINT) AS h1num_hi,
           CAST(sum(CASE WHEN kind = 'u' THEN term % {_HALF} ELSE 0 END)
                AS BIGINT) AS h1num_lo,
           CAST(sum(CASE WHEN kind = 'b' THEN term // {_HALF} ELSE 0 END)
                AS BIGINT) AS h2num_hi,
           CAST(sum(CASE WHEN kind = 'b' THEN term % {_HALF} ELSE 0 END)
                AS BIGINT) AS h2num_lo
    FROM tm GROUP BY source
    """,
    description=(
        "character-level entropy sufficient statistics per source — "
        "the below-the-tokenizer gibberish/OCR detector: unigram and "
        "bigram gram counts feed H = ln(N) − Σc·ln(c)/N, with the "
        "per-gram c·ln(c) terms micro-nat quantized and summed as "
        "BIGINT hi/lo halves (no 128-bit output column). Conditional "
        "entropy H(c|prev) = H₂ − H₁ and the per-source band check are "
        "assembled by the pytest gate. Docs shorter than 2 chars are "
        "excluded on BOTH sides (a 1-char doc has no bigram). Shape: "
        "ONE labeled explode (unigrams and bigrams ride the same pass "
        "tagged 'u'/'b' — the r8 one-labeled-frame trick), one gram "
        "count agg, one per-source fold; grams are ≤2 chars so the "
        "shuffle carries (source, kind, 2-char) ints, never text"
    ),
    tags=("documents", "text", "quality"),
)
def doc_char_bigram_entropy(spark, sf_dir):
    docs = fan_out(
        spark,
        t(spark, sf_dir, "documents").filter(F.length("text") >= 2),
    )
    grams = docs.select(
        "source",
        F.expr(
            "explode(concat("
            "  transform(sequence(1, length(text)),"
            "            i -> struct('u' AS kind, substring(text, i, 1) AS gram)),"
            "  transform(sequence(1, length(text) - 1),"
            "            i -> struct('b' AS kind, substring(text, i, 2) AS gram))"
            ")) AS g"
        ),
    ).select("source", F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
    c = grams.groupBy("source", "kind", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    term = (
        F.col("c")
        * F.round(F.log(F.col("c").cast("double")) * _LN_U).cast("bigint")
    ).alias("term")
    tm = c.select("source", "kind", "c", term)

    def _k(kind, expr):
        return F.sum(F.when(F.col("kind") == kind, expr).otherwise(F.lit(0)))

    return tm.groupBy("source").agg(
        _k("u", F.col("c")).cast("bigint").alias("n_uni"),
        _k("b", F.col("c")).cast("bigint").alias("n_big"),
        _k("u", F.lit(1)).cast("bigint").alias("u_distinct"),
        _k("b", F.lit(1)).cast("bigint").alias("b_distinct"),
        _k("u", F.expr(f"term DIV {_HALF}")).cast("bigint").alias("h1num_hi"),
        _k("u", F.col("term") % _HALF).cast("bigint").alias("h1num_lo"),
        _k("b", F.expr(f"term DIV {_HALF}")).cast("bigint").alias("h2num_hi"),
        _k("b", F.col("term") % _HALF).cast("bigint").alias("h2num_lo"),
    )


@register(
    "doc_blocklist_filter",
    oracle=f"""
    WITH d AS (
      SELECT source, n_chars,
             len(list_filter(string_split(text, ' '),
                             w -> w IN {_BLOCKLIST!r})) AS n_hits
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(n_hits) AS BIGINT) AS blocked_instances,
           CAST(sum(CASE WHEN n_hits = 0 THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars,
           CAST((count(*) - sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END))
                * 10000 // count(*) AS BIGINT) AS keep_rate_bp
    FROM d GROUP BY source
    """,
    description=(
        "C4-style blocked-word filter audit per source: a literal "
        "blocklist is evaluated with a map-side array HOF (split + "
        "filter + size — NO explode, the token stream never "
        "materializes as rows), then one aggregate reports flagged "
        "docs, blocked instances, surviving chars, and the floored "
        "basis-point keep rate. The list spans a common hit, a rare "
        "hit, and a zero-hit term so every outcome path is exercised. "
        "Shape: one scan, one hash aggregate — the shuffle carries "
        "5 ints per source; at 100 TB the blocklist ships as a plan "
        "literal exactly like the bloom bitset twin"
    ),
    tags=("documents", "text", "filtering"),
)
def doc_blocklist_filter(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    in_list = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    d = docs.select(
        "source",
        "n_chars",
        F.expr(
            f"size(filter(split(text, ' '), w -> w IN ({in_list})))"
        ).alias("n_hits"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("n_hits").cast("bigint").alias("blocked_instances"),
        F.sum(F.when(F.col("n_hits") == 0, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
        F.expr(
            "CAST((count(1) - sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END))"
            " * 10000 DIV count(1) AS BIGINT)"
        ).alias("keep_rate_bp"),
    )
