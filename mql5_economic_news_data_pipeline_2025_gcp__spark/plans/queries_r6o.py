"""Round-6 continuation (batch o): multimodal curation operators.

Both run the REAL multimodal plumbing (binary payloads →
``mapInPandas`` decode → metadata columns; the decode stub is
deterministic, so the DuckDB oracle can replicate its arithmetic —
the established pattern of ``mm_media_meta``) and then pure-integer
curation math on top: resolution bucketing with padding-waste
accounting (the image analogue of ``doc_length_batching``) and a
target-mix sampling plan across modalities (the multimodal analogue
of ``doc_mix_sample``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register
from ..operators.multimodal import documents_as_media, extract_media_meta


@register(
    "mm_resolution_buckets",
    oracle=r"""
    WITH m AS (
      SELECT octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 0),
    wh AS (
      SELECT CAST(64 + n % 512 AS BIGINT) AS w,
             CAST(64 + (n // 7) % 512 AS BIGINT) AS h
      FROM m),
    b AS (
      SELECT CASE WHEN w * 3 >= h * 4 THEN 'wide'
                  WHEN h * 3 >= w * 4 THEN 'tall'
                  ELSE 'square' END AS aspect,
             (w * h) // 100000 AS mp_band,
             w, h
      FROM wh),
    g AS (
      SELECT aspect, mp_band,
             CAST(count(*) AS BIGINT) AS n_assets,
             CAST(sum(w * h) AS BIGINT) AS pixels,
             CAST(max(w) AS BIGINT) AS max_w,
             CAST(max(h) AS BIGINT) AS max_h
      FROM b GROUP BY aspect, mp_band)
    SELECT aspect, CAST(mp_band AS BIGINT) AS mp_band,
           n_assets, pixels, max_w, max_h,
           (n_assets * max_w * max_h - pixels) * 10000
             // (n_assets * max_w * max_h) AS pad_waste_bp
    FROM g
    """,
    description="image resolution bucketing for batched training: "
    "aspect class (integer cross-multiplied 4:3 thresholds) x 0.1MP "
    "band from the decoded metadata, with exact padding-waste basis "
    "points if each bucket batches to its max dims - the image "
    "analogue of doc_length_batching",
    tags=("multimodal", "pandas-udf"),
)
def mm_resolution_buckets(spark, sf_dir):
    """Bucket images so batches waste minimal padding — the multimodal
    curation step between decode and the training dataloader.

    Runs the REAL pipeline: binary payloads → ``mapInPandas`` decode
    (`operators/multimodal.py::extract_media_meta` — Arrow batches,
    typed schema) → pure-JVM bucketing math on the metadata columns.
    Aspect classes use integer cross-multiplication (``3w ≥ 4h`` ⇔
    ratio ≥ 4:3 — no float ratios at bucket boundaries); the waste
    readout ``(n·maxW·maxH − Σwh)/(n·maxW·maxH)`` is the exact padding
    cost of batching each bucket to its max dims, in basis points.

    Scale: decode is map-only over payload partitions (payload bytes
    never shuffle — only the small metadata columns reach the
    aggregation); output is the bounded bucket grid.
    """
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    meta = extract_media_meta(documents_as_media(docs))
    img = meta.filter(F.col("media_type") == "image").select(
        F.col("width").cast("bigint").alias("w"),
        F.col("height").cast("bigint").alias("h"),
    )
    b = img.select(
        F.when(F.col("w") * 3 >= F.col("h") * 4, "wide")
        .when(F.col("h") * 3 >= F.col("w") * 4, "tall")
        .otherwise("square")
        .alias("aspect"),
        F.expr("(w * h) DIV 100000").alias("mp_band"),
        "w", "h",
    )
    g = b.groupBy("aspect", F.col("mp_band").cast("bigint").alias("mp_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum(F.col("w") * F.col("h")).cast("bigint").alias("pixels"),
        F.max("w").cast("bigint").alias("max_w"),
        F.max("h").cast("bigint").alias("max_h"),
    )
    return g.select(
        "aspect", "mp_band", "n_assets", "pixels", "max_w", "max_h",
        F.expr(
            "(n_assets * max_w * max_h - pixels) * 10000"
            " DIV (n_assets * max_w * max_h)"
        ).alias("pad_waste_bp"),
    )


#: target modality mix (percent) and sampling budget share — literals.
_MIX = {"image": 50, "audio": 30, "video": 20}


@register(
    "mm_modality_mix_plan",
    oracle=r"""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n
      FROM documents),
    g AS (
      SELECT media_type,
             CAST(count(*) AS BIGINT) AS n_assets,
             CAST(sum(n) AS BIGINT) AS n_bytes,
             CAST(sum(count(*)) OVER () AS BIGINT) AS total_assets
      FROM m GROUP BY media_type),
    plan AS (
      SELECT media_type, n_assets, n_bytes, total_assets,
             (total_assets // 2)
               * CASE media_type WHEN 'image' THEN 50
                                 WHEN 'audio' THEN 30
                                 ELSE 20 END // 100 AS quota
      FROM g)
    SELECT media_type, n_assets, n_bytes, quota,
           CAST(least(10000, quota * 10000 // n_assets) AS BIGINT)
             AS accept_bp,
           CAST(greatest(quota - n_assets, 0) AS BIGINT) AS shortfall
    FROM plan
    """,
    description="modality mix planner: integer quotas for a 50/30/20 "
    "image/audio/video target over a half-corpus sampling budget, "
    "per-modality acceptance rate in exact basis points and "
    "oversubscription shortfall - the multimodal doc_mix_sample",
    tags=("multimodal",),
)
def mm_modality_mix_plan(spark, sf_dir):
    """Plan the modality mix before sampling — budget math first, THEN
    the (md5-uniform) accept pass, so the plan is auditable.

    Allocates a sampling budget (half the corpus) across modalities at
    literal target shares; each modality's acceptance rate is the
    exact integer ``quota·10000 DIV n`` capped at 100%, with the
    shortfall reported when a modality cannot fill its quota (the
    signal to re-weight or backfill).  Pure integer arithmetic —
    downstream, the same md5-threshold accept used by `doc_mix_sample`
    applies these rates deterministically.

    Scale: one metadata aggregation to k=3 rows (bytes counted from
    payload length — the payloads themselves never shuffle).
    """
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    media = documents_as_media(docs)
    g = media.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum(F.length("payload")).cast("bigint").alias("n_bytes"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    plan = g.select(
        "media_type", "n_assets", "n_bytes",
        F.sum("n_assets").over(wall).cast("bigint").alias("total_assets"),
    ).withColumn(
        "quota",
        F.expr(
            "(total_assets DIV 2) * CASE media_type"
            " WHEN 'image' THEN 50 WHEN 'audio' THEN 30"
            " ELSE 20 END DIV 100"
        ),
    )
    return plan.select(
        "media_type", "n_assets", "n_bytes", "quota",
        F.least(
            F.lit(10000).cast("bigint"),
            F.expr("quota * 10000 DIV n_assets"),
        )
        .cast("bigint")
        .alias("accept_bp"),
        F.greatest(F.col("quota") - F.col("n_assets"), F.lit(0))
        .cast("bigint")
        .alias("shortfall"),
    )
