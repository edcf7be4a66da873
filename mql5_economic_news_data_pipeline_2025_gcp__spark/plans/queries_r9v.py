"""Round-9 batch v: LLM watermark detection over the document corpus.

``doc_watermark_greenlist`` — the Kirchenbauer-style green-list
watermark DETECTOR: a watermarking LLM biases each token toward a
"green list" seeded by the previous token's hash; the detector
recomputes, for every adjacent token pair, whether the successor landed
green (here: md5(prev:cur) low bits even — an engine-portable stand-in
for the scheme's seeded PRF) and z-tests the green fraction against
the null p = 1/2.  A data-curation pipeline runs exactly this scan to
keep watermarked synthetic text OUT of pretraining corpora; on this
UNWATERMARKED fixture corpus the per-source z-scores must sit near 0 —
which is itself the property the gate pins (the detector's false-
positive behavior), alongside an exact hashlib replay of the counts.

Determinism: tokenization is a whitespace split (the corpus
convention); greenness is md5 hex-window parity (the registry's
portable-digest idiom); counts are exact BIGINTs per source.  The
z-score (√ and division) is assembled by the gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register

#: per-pair green test: low 16 bits of md5('wm:' || prev || ':' || cur)
_GREEN_SQL_DUCK = (
    "('0x' || substr(md5('wm:' || ws[i - 1] || ':' || ws[i]), 1, 4))"
    "::BIGINT % 2"
)
_GREEN_SQL_SPARK = (
    "conv(substring(md5(concat('wm:', element_at(ws, i - 1), ':', "
    "element_at(ws, i))), 1, 4), 16, 10) % 2"
)


@register(
    "doc_watermark_greenlist",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, source,
             CAST(len(ws) - 1 AS BIGINT) AS n_pairs,
             CAST(list_sum(list_transform(range(2, len(ws) + 1),
                  i -> CASE WHEN {_GREEN_SQL_DUCK} = 0
                            THEN 1 ELSE 0 END)) AS BIGINT) AS n_green
      FROM w WHERE len(ws) >= 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
           CAST(sum(n_green) AS BIGINT) AS n_green,
           CAST(sum(CASE WHEN 2 * n_green > n_pairs
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_green_majority
    FROM g GROUP BY source
    """,
    description=(
        "Kirchenbauer-style watermark detection scan per source: for "
        "every adjacent token pair, the successor is 'green' when "
        "md5('wm:'||prev||':'||cur) has even low bits (the portable "
        "stand-in for the scheme's seeded PRF), counted map-side "
        "inside array HOFs — no explode, no token shuffle. Emits per "
        "source the pair and green totals plus the count of docs "
        "with a green MAJORITY; the gate replays the hashes with "
        "hashlib exactly and pins the detector's false-positive "
        "behavior on this unwatermarked corpus (per-source "
        "z = (g − p/2·n)/√(n/4) near 0, fraction within binomial "
        "bands). The pretraining-curation scan that keeps "
        "watermarked synthetic text out. Shape: map-side split + "
        "HOF fold + ONE source aggregate"
    ),
    tags=("documents", "quality", "curation"),
)
def doc_watermark_greenlist(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    w = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    g = w.select(
        "source",
        (F.size("ws") - 1).cast("bigint").alias("n_pairs"),
        F.expr(
            "aggregate(transform(sequence(2, size(ws)),"
            f" i -> CASE WHEN {_GREEN_SQL_SPARK} = 0 THEN 1 ELSE 0 END),"
            " 0L, (acc, x) -> acc + x)"
        )
        .cast("bigint")
        .alias("n_green"),
    )
    return g.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_pairs").cast("bigint").alias("n_pairs"),
        F.sum("n_green").cast("bigint").alias("n_green"),
        F.sum(
            F.when(2 * F.col("n_green") > F.col("n_pairs"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_docs_green_majority"),
    )
