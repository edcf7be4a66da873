"""Natural-key upsert (reference S9: ``INSERT ... ON DUPLICATE KEY
UPDATE`` on UNIQUE(Date,Time,Currency,Event) — `SQL:20`, `PUSH:175-188`).

Spark-first design: Parquet has no in-place update, so upsert =
``unionByName(existing, incoming)`` → window dedup keeping the newest
version per natural key. A recency column decides the winner; within the
same batch, a monotonically increasing ingest sequence breaks ties so
"latest delivered wins" exactly like MySQL's ON DUPLICATE KEY UPDATE.

Scale notes (100 TB): the dedup is one hash shuffle on the natural key —
the same cost profile as any wide agg. On a real deployment this is the
classic Delta/Iceberg ``MERGE INTO``; without those jars we keep the
union+window formulation, which AQE handles well under key skew. For
incremental loads, partition the table by month(event_ts) and rewrite
only partitions that received keys (partition pruning makes the
read-back cheap).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Natural dedup identity of the events table (reference SQL:20).
NATURAL_KEY = ["Date", "Time", "Currency", "Event"]


def upsert(
    existing: DataFrame | None,
    incoming: DataFrame,
    key: Sequence[str] = tuple(NATURAL_KEY),
    recency_col: str = "event_ts",
) -> DataFrame:
    """Union + keep-newest-per-key. ``incoming`` beats ``existing`` on
    ties, and within a batch the LAST-delivered row wins — the sequential
    ``executemany`` upsert applies updates in delivery order, so a batch
    containing the same key twice ends with the later row's values. The
    delivery order is captured as ``monotonically_increasing_id()`` over
    the incoming scan (increasing in file/row order per split)."""
    inc = incoming.withColumn("_src_priority", F.lit(1)).withColumn(
        "_ingest_seq", F.monotonically_increasing_id()
    )
    if existing is None:
        unioned = inc
    else:
        unioned = (
            existing.withColumn("_src_priority", F.lit(0))
            .withColumn("_ingest_seq", F.lit(-1).cast("long"))
            .unionByName(inc)
        )
    w = Window.partitionBy(*key).orderBy(
        F.col("_src_priority").desc(),
        F.col(recency_col).desc(),
        F.col("_ingest_seq").desc(),
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_priority", "_ingest_seq")
    )


# ------------------------------------------------------- partitioned merge
# S9 at 100 TB (`PUSH:175-188` semantics at scale): the monthly ingest
# batch touches a handful of partitions; rewriting the whole table (the
# plain union+window upsert above) re-shuffles and re-writes 100 TB to
# apply a few GB. The merge below prunes BOTH sides to the partitions
# actually present in the batch — the read-back scans only touched
# partitions (partition pruning), and dynamic partition overwrite
# replaces only those directories, leaving every untouched partition's
# files byte-identical (asserted by test_merge_upsert_partition_pruned).
#
# Precondition: the natural key must functionally determine the
# partition column (the reference's key contains Date; partition =
# month(Date)), so a key's versions can never span partitions and
# per-partition dedup IS the global dedup.

#: Hard cap on distinct partition values collected from a batch — a
#: monthly/daily ingest touches O(1..100) partitions; hitting this means
#: the caller passed a corpus, not a batch.
MAX_BATCH_PARTITIONS = 10_000


def _touched_partitions(
    incoming: DataFrame, partition_col: str, cap: int = MAX_BATCH_PARTITIONS
) -> list:
    vals = [
        r[0]
        for r in incoming.select(partition_col)
        .distinct()
        .limit(cap + 1)
        .collect()
    ]
    if len(vals) > cap:
        raise ValueError(
            f"incoming batch touches >{cap} distinct {partition_col!r} "
            "partitions — this is a table, not an incremental batch; "
            "use save_partitioned/save_replace instead"
        )
    return vals


def _partition_filter(partition_col: str, vals: list):
    cond = F.col(partition_col).isin([v for v in vals if v is not None])
    if any(v is None for v in vals):
        cond = cond | F.col(partition_col).isNull()
    return cond


def _merge_touched(
    existing_touched: DataFrame,
    incoming: DataFrame,
    key: Sequence[str],
    recency_col: str,
    tie_cols: Sequence[str],
) -> DataFrame:
    """Keep-newest-per-key over (existing ∪ incoming); incoming beats
    existing on recency ties, then ``tie_cols`` (descending) make the
    winner deterministic when key+recency still collides."""
    inc = incoming.withColumn("_pri", F.lit(1))
    ex = existing_touched.withColumn("_pri", F.lit(0))
    order = [F.col("_pri").desc(), F.col(recency_col).desc()] + [
        F.col(c).desc() for c in tie_cols
    ]
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        ex.unionByName(inc)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pri")
    )


def merge_upsert_partitioned(
    existing: DataFrame,
    incoming: DataFrame,
    key: Sequence[str] = tuple(NATURAL_KEY),
    recency_col: str = "event_ts",
    tie_cols: Sequence[str] = (),
    partition_col: str = "event_month",
    max_partitions: int = MAX_BATCH_PARTITIONS,
) -> tuple[DataFrame, list]:
    """Relational core of the partition-pruned merge: rows of
    ``existing`` in untouched partitions pass through UNREAD by the
    dedup (no shuffle, no rewrite), while touched partitions get the
    keep-newest-per-key merge. Returns ``(result, touched_values)``.

    Scale shape: one bounded ``distinct().collect()`` on the partition
    column (capped at MAX_BATCH_PARTITIONS), then one hash shuffle on
    the natural key over touched-partition rows ONLY — cost is
    proportional to the batch's partitions, not the table.
    """
    vals = _touched_partitions(incoming, partition_col, max_partitions)
    cond = _partition_filter(partition_col, vals)
    merged = _merge_touched(
        existing.filter(cond), incoming, key, recency_col, tie_cols
    )
    untouched = existing.filter(~F.coalesce(cond, F.lit(False)))
    return untouched.unionByName(merged), vals


def merge_upsert_to_path(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    key: Sequence[str] = tuple(NATURAL_KEY),
    recency_col: str = "event_ts",
    tie_cols: Sequence[str] = (),
    partition_col: str = "event_month",
) -> list:
    """Write-side S9 merge: apply an incremental batch to a
    hive-partitioned parquet table, rewriting ONLY the partitions the
    batch touches. Returns the touched partition values.

    Mechanics: read back the table pruned to touched partitions, merge
    keep-newest-per-key, then write with dynamic partition overwrite so
    only touched partition directories are replaced. The merged frame is
    ``localCheckpoint``-ed first — it is batch-sized (touched partitions
    only), and materializing it breaks the plan's lineage on ``path`` so
    the overwrite of a just-read location is legal and cannot corrupt
    its own input. On a deployment with a transactional table format
    (Delta/Iceberg) this whole function is ``MERGE INTO``; the parquet
    formulation keeps identical semantics with per-partition atomicity.
    """
    deduped_in = _merge_touched(
        incoming.limit(0), incoming, key, recency_col, tie_cols
    )
    if not os.path.exists(path):
        _write_dynamic(deduped_in, path, partition_col)
        return _touched_partitions(incoming, partition_col)

    vals = _touched_partitions(incoming, partition_col)
    existing = spark.read.parquet(path).filter(
        _partition_filter(partition_col, vals)
    )
    merged = _merge_touched(
        existing, incoming, key, recency_col, tie_cols
    ).localCheckpoint()
    _write_dynamic(merged, path, partition_col)
    return vals


def _write_dynamic(df: DataFrame, path: str, partition_col: str) -> None:
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
