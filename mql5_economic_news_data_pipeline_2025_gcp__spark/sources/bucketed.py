"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant recurring cost of the star joins
(orders⋈customer, events⋈routing-at-scale) is re-shuffling both sides
on every query. Writing the tables bucketed by the join key fixes the
partitioning ON DISK: Spark records the bucket spec in the catalog and
a join on the bucket key needs NO exchange on either side (verified by
the bucketing unit test: zero `Exchange` nodes in the joined plan).

Choose bucket counts so a bucket ≈ one task's worth of data
(128-512 MB); both sides of a co-located join must share the count (or
one divides the other with bucket coalescing enabled).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    by the join key. Sorting within buckets additionally removes the
    sort from sort-merge joins and makes window scans sequential."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cluster_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    names: tuple[str, str] = ("_bkt_left", "_bkt_right"),
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """One-time materialization of both sides bucketed on the join key;
    returns the catalog-backed frames whose joins on ``key`` are
    exchange-free."""
    write_bucketed(left, names[0], key, n_buckets)
    write_bucketed(right, names[1], key, n_buckets)
    return spark.table(names[0]), spark.table(names[1])
