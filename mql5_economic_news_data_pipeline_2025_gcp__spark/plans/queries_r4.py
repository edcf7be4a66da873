"""Round-4 query registry: the partition-pruned merge upsert (S9 at
scale) and the JVM hot-path twin of the robust-stats UDAF.

All follow the determinism contract in ``registry`` — integer-exact
aggregation, identical division trees, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "evt_upsert_merge_partitioned",
    oracle="""
    WITH base AS (
      SELECT event_id, ts, user_id, event_type,
             CAST(ts AS DATE) AS event_date,
             CAST(round(value*100) AS BIGINT) AS value_c
      FROM events),
    existing AS (
      SELECT * FROM base WHERE event_id % 5 <> 0),
    incoming AS (
      SELECT event_id, ts, user_id, event_type, event_date,
             value_c + 1 AS value_c
      FROM base
      WHERE event_id % 3 = 0 AND EXTRACT(day FROM ts) >= 20),
    touched AS (SELECT DISTINCT event_date FROM incoming),
    unioned AS (
      SELECT e.event_id, e.ts, e.user_id, e.event_type, e.event_date,
             e.value_c, 0 AS pri
      FROM existing e
      WHERE e.event_date IN (SELECT event_date FROM touched)
      UNION ALL
      SELECT i.event_id, i.ts, i.user_id, i.event_type, i.event_date,
             i.value_c, 1 AS pri
      FROM incoming i),
    merged AS (
      SELECT user_id, event_type, event_date, event_id, value_c,
             row_number() OVER (
               PARTITION BY user_id, event_type, event_date
               ORDER BY pri DESC, ts DESC, event_id DESC) AS rn
      FROM unioned)
    SELECT user_id, event_type, event_date, event_id, value_c
    FROM merged WHERE rn = 1
    UNION ALL
    SELECT user_id, event_type, event_date, event_id, value_c
    FROM existing
    WHERE event_date NOT IN (SELECT event_date FROM touched)
    """,
    description=(
        "partition-pruned incremental merge (S9 at scale, PUSH:175-188 "
        "semantics): an incremental batch (every 3rd event from the last "
        "third of the month, values bumped +1¢ to prove incoming wins) "
        "merges into the existing table (every event off the 5-grid) — "
        "keep-newest-per-(user,event_type,day) runs ONLY over the "
        "partitions the batch touches, while untouched days pass through "
        "without entering the dedup shuffle at all. This is the plan "
        "shape that makes monthly ingest O(batch) instead of O(table) at "
        "100 TB: bounded distinct() on the partition column, pruned "
        "read-back, dynamic partition overwrite on the write side "
        "(write side: operators/upsert.py merge_upsert_to_path, "
        "byte-identity of untouched partitions asserted by "
        "test_merge_upsert_partition_pruned)"
    ),
    tags=("events", "upsert", "merge", "partitioning"),
)
def evt_upsert_merge_partitioned(spark, sf_dir):
    from ..operators.upsert import merge_upsert_partitioned

    base = keyed_events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
    existing = base.filter(F.col("event_id") % 5 != 0)
    incoming = (
        base.filter(
            (F.col("event_id") % 3 == 0) & (F.dayofmonth("ts") >= 20)
        )
        .withColumn("value_c", F.col("value_c") + 1)
    )
    result, _ = merge_upsert_partitioned(
        existing,
        incoming,
        key=("user_id", "event_type", "event_date"),
        recency_col="ts",
        tie_cols=("event_id",),
        partition_col="event_date",
    )
    return result.select(
        "user_id", "event_type", "event_date", "event_id", "value_c"
    )


@register(
    "evt_series_mad_fast",
    oracle="""
    WITH v AS (
      SELECT user_id, event_type, event_id,
             CAST(round(value*100) AS BIGINT) AS value_c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, event_type, value_c,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY value_c, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type) AS n
      FROM v),
    med AS (
      SELECT user_id, event_type,
             min(CASE WHEN rn = (n+1) // 2 THEN value_c END) AS med_c,
             CAST(max(n) AS BIGINT) AS n
      FROM r GROUP BY user_id, event_type),
    dev AS (
      SELECT v.user_id, v.event_type,
             abs(v.value_c - m.med_c) AS d,
             row_number() OVER (PARTITION BY v.user_id, v.event_type
                                ORDER BY abs(v.value_c - m.med_c)) AS rn,
             count(*) OVER (PARTITION BY v.user_id, v.event_type) AS nn
      FROM v JOIN med m ON v.user_id = m.user_id
                       AND v.event_type = m.event_type)
    SELECT d.user_id, d.event_type, m.n,
           CAST(m.med_c AS BIGINT) AS med_c,
           CAST(min(CASE WHEN d.rn = (d.nn+1) // 2 THEN d.d END) AS BIGINT)
             AS mad_c
    FROM dev d JOIN med m ON d.user_id = m.user_id
                         AND d.event_type = m.event_type
    GROUP BY d.user_id, d.event_type, m.n, m.med_c
    """,
    description=(
        "per-series nearest-rank median + MAD, pure JVM (the hot-path "
        "twin of the GROUPED_AGG pandas-UDAF seam): double row_number "
        "construction — rank values per series, pick rank (n+1) div 2 "
        "for the median (an actual element, never interpolated), join "
        "the median back on the series key (same partitioning as the "
        "window → no extra exchange) and rank absolute deviations for "
        "the MAD. Whole-stage codegen end to end, no Python workers, no "
        "per-group Arrow round-trips — the form for 10⁶+ series; the "
        "UDAF demo stays as a tested API seam "
        "(tests/test_operators.py::test_series_mad_udaf_matches_fast)"
    ),
    tags=("events", "window", "robust-stats"),
)
def evt_series_mad_fast(spark, sf_dir):
    from ..operators.grouped import series_robust_stats_fast

    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    return series_robust_stats_fast(
        ev,
        key=("user_id", "event_type"),
        value_col="value_c",
        tie_col="event_id",
    )


@register(
    "emb_ivfpq_residual_topk",
    oracle=None,  # iteratively-fit residual codebooks + IVF probing: no
    # SQL form; retrieval quality gated by test_ivfpq_recall_at_k (≥0.6)
    description=(
        "IVF-PQ with RESIDUAL encoding + exact re-rank — the quality "
        "form of the billion-vector serving shape at the SAME candidate "
        "set: corpus residuals (v − cell centroid, map-side zip_with "
        "against the broadcast centroid join) are PQ-encoded so the "
        "code budget covers the within-cell distribution instead of "
        "the whole space; per-(query, probed-cell) residual ADC lookup "
        "rows ride one tiny broadcast keyed by (query_id, cell); the "
        "integer ADC ordering shortlists top-R per query and only that "
        "shortlist gets exact float L2 against real vectors (|q|·R "
        "distances — ADC error decides ranks below R, never the final "
        "top-k). Measured recall@5 on the fixture: 0.39 plain → 0.65 "
        "residual+re-rank at identical code size and nprobe"
    ),
    tags=("embeddings", "similarity", "pq", "ivf", "rerank"),
)
def emb_ivfpq_residual_topk(spark, sf_dir):
    from ..operators.pq import ivfpq_topk_residual, train_codebooks_residual
    from ..operators.similarity import _as_double

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        _as_double(F.col("embedding")).alias("cv"),
    )
    books = train_codebooks_residual(emb, centroids, m=16, k=32)
    return ivfpq_topk_residual(
        emb, books, centroids,
        encode_partitions=spark.sparkContext.defaultParallelism,
    )
