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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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
