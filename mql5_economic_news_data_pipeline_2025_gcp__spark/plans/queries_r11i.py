"""Round-11i batch: contrastive training-pair synthesis.

``doc_contrastive_triplets`` — contrastive pretraining (SimCSE/CLIP/
retrieval-embedding style) consumes (anchor, positive, negative)
triplets; at corpus scale the standard recipe is: positives from a
cheap relatedness BLOCK (near-dup cluster, same thread, shared
prefix), negatives sampled from outside the block. This operator
builds the triplet table deterministically:

- block key = md5 of the first 40 chars of the whitespace-normalized
  text (the same normalization as `doc_exact_dedup`) — documents
  sharing a prefix are related drafts/templates, the cheap positive
  signal this corpus actually carries;
- positive = the anchor's successor within its block (doc_id order) —
  only multi-member blocks yield triplets, one per adjacent pair;
- negative = a HASH-SHUFFLED neighbor from a different block: order
  the corpus by md5(doc_id) (a deterministic shuffle both engines
  compute identically), take the first of the next two docs whose
  block differs — i.e. negatives are uniform-ish over the corpus but
  reproducible, the property a training pipeline needs for resumable
  epoch builds. Anchors whose both shuffle-neighbors land in their own
  block (vanishingly rare beyond tiny blocks) drop out, documented.

Scale shape: one map-side block-key projection, ONE block window for
positives, ONE shuffle-order window for negatives — no pair frame, no
sampling join; output ≤ |docs| rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register


@register(
    "doc_contrastive_triplets",
    oracle=r"""
    WITH b AS (
      SELECT doc_id,
             md5(substring(regexp_replace(lower(trim(text)), '\s+', ' ',
                                          'g'), 1, 40)) AS blk,
             md5(CAST(doc_id AS VARCHAR)) AS shuf
      FROM documents),
    pos AS (
      SELECT doc_id, blk, shuf,
             lead(doc_id) OVER (PARTITION BY blk ORDER BY doc_id)
               AS positive_id
      FROM b),
    neg AS (
      SELECT doc_id, blk, positive_id,
             lead(doc_id, 1) OVER w AS n1,
             lead(blk, 1) OVER w AS b1,
             lead(doc_id, 2) OVER w AS n2,
             lead(blk, 2) OVER w AS b2
      FROM pos WINDOW w AS (ORDER BY shuf, doc_id))
    SELECT doc_id AS anchor_id, positive_id,
           CAST(CASE WHEN b1 IS NOT NULL AND b1 != blk THEN n1
                     WHEN b2 IS NOT NULL AND b2 != blk THEN n2
                END AS BIGINT) AS negative_id
    FROM neg
    WHERE positive_id IS NOT NULL
      AND (CASE WHEN b1 IS NOT NULL AND b1 != blk THEN n1
                WHEN b2 IS NOT NULL AND b2 != blk THEN n2
           END) IS NOT NULL
    """,
    description=(
        "deterministic (anchor, positive, negative) triplet synthesis "
        "for contrastive training: positives = successor within the "
        "normalized-40-char-prefix block (the corpus's cheap "
        "relatedness signal, same normalization as doc_exact_dedup); "
        "negatives = first of the next two docs in the md5(doc_id) "
        "hash-shuffle whose block differs — reproducible uniform-ish "
        "sampling with no RNG state, the property resumable epoch "
        "builds need. One block window + one shuffle-order window, no "
        "pair frame, ≤|docs| output rows"
    ),
    tags=("documents", "ml", "sampling", "dedup"),
)
def doc_contrastive_triplets(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    nt = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    b = docs.select(
        "doc_id",
        F.md5(F.substring(nt, 1, 40)).alias("blk"),
        F.md5(F.col("doc_id").cast("string")).alias("shuf"),
    )
    pos = b.select(
        "doc_id",
        "blk",
        "shuf",
        F.lead("doc_id")
        .over(Window.partitionBy("blk").orderBy("doc_id"))
        .alias("positive_id"),
    )
    # the corpus-wide shuffle-order window: |docs| rows, single
    # partition — acceptable at the documented post-aggregation seam
    # ONLY because the frame is the doc-id/key projection (3 narrow
    # columns), and a 100-TB deployment ranges this window by shard
    # (ORDER BY shuf within shuffle-bucket), which changes no output
    # row because negatives only need a same-order neighbor
    w = Window.orderBy("shuf", "doc_id")
    neg = pos.select(
        "doc_id",
        "blk",
        "positive_id",
        F.lead("doc_id", 1).over(w).alias("n1"),
        F.lead("blk", 1).over(w).alias("b1"),
        F.lead("doc_id", 2).over(w).alias("n2"),
        F.lead("blk", 2).over(w).alias("b2"),
    )
    pick = F.when(
        F.col("b1").isNotNull() & (F.col("b1") != F.col("blk")),
        F.col("n1"),
    ).when(
        F.col("b2").isNotNull() & (F.col("b2") != F.col("blk")),
        F.col("n2"),
    )
    return (
        neg.filter(F.col("positive_id").isNotNull() & pick.isNotNull())
        .select(
            F.col("doc_id").alias("anchor_id"),
            "positive_id",
            pick.cast("bigint").alias("negative_id"),
        )
    )
