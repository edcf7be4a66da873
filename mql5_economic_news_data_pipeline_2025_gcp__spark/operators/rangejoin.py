"""Interval (range) join: points ⋈ intervals on
``start <= ts < end`` within a key — the second time-series join Spark
lacks as a primitive (companion to ``operators.asof``).

Scale-correct construction — time-bucketed equi-join, NOT a theta join:

    bucket the time axis with width W → each interval explodes to its
    covered buckets (⌈len/W⌉+1 rows, bounded when W ≈ typical interval
    length) → each point maps to exactly ONE bucket → equi-join on
    (key, bucket) → exact post-filter on the range predicate.

A naive ``p.key = i.key AND p.ts BETWEEN ...`` join is a broadcast
nested loop (or per-key cross product) — O(|points|·|intervals|) per
key. The bucketed form shuffles on (key, bucket) like any equi-join and
compares each point only against intervals overlapping its bucket.
Because a point lives in one bucket and the interval copy in that
bucket is unique, no dedup is needed after the filter.

Pick ``bucket_width`` near the P95 interval length: wider buckets mean
fewer interval replicas but more false candidates per bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner-join every point to each interval containing it
    (``start <= ts < end``, per key). Returns points columns + interval
    columns (minus the key, to avoid duplication)."""
    w_us = int(bucket_width_s) * 1_000_000
    p = points.withColumn("_b", F.expr(f"unix_micros({ts_col}) div {w_us}"))
    i = (
        intervals.withColumn("_bs", F.expr(f"unix_micros({start_col}) div {w_us}"))
        .withColumn("_be", F.expr(f"unix_micros({end_col}) div {w_us}"))
        .withColumn("_b", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
        .drop("_bs", "_be")
    )
    icols = [c for c in intervals.columns if c not in key]
    joined = p.join(i, on=[*key, "_b"]).filter(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.select(*points.columns, *icols)
