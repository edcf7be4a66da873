"""Python Data Source connector (sources/pysource.py): partition
coverage, option handling, and downstream-plan integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.pysource import (
    read_synthetic_events,
)


def test_partitions_cover_rows_exactly_once(spark):
    df = read_synthetic_events(spark, n_rows=5000, n_parts=7)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("d"),
        F.sum("event_id").alias("s"),
    ).first()
    assert agg["n"] == 5000 and agg["d"] == 5000
    assert agg["s"] == 5000 * 4999 // 2  # stride gaps/overlaps break this


def test_parallelism_matches_requested_partitions(spark):
    df = read_synthetic_events(spark, n_rows=1000, n_parts=5)
    assert df.rdd.getNumPartitions() == 5


def test_rows_are_deterministic_functions_of_id(spark):
    import hashlib

    row = (
        read_synthetic_events(spark, n_rows=100, n_parts=3)
        .filter(F.col("event_id") == 42)
        .first()
    )
    h = hashlib.md5(b"42").hexdigest()
    assert row["user_id"] == int(h[:4], 16) % 100
    assert row["value_c"] == int(h[5:12], 16) % 1000000


def test_downstream_ops_compose(spark):
    """The custom scan feeds ordinary Catalyst plans (joins, windows)."""
    from pyspark.sql import Window

    df = read_synthetic_events(spark, n_rows=2000, n_parts=4)
    w = Window.partitionBy("event_type").orderBy(F.desc("value_c"), "event_id")
    top = df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    assert top.count() == 12  # 4 types x top-3
