"""Per-group model routing (reference TRAIN:377-389): groups with
>= ``threshold`` samples route to 'rnn', smaller groups to 'xgb';
lookup misses default to 'xgb' (TRAIN:453).

One hash aggregate produces the routing table; consumers broadcast-join
it (it is tiny: one row per (Currency,Event)) and ``coalesce`` the
default — J2 in SURVEY §2.3.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RNN_THRESHOLD = 50


def model_routing(
    df: DataFrame,
    key: Sequence[str] = ("Currency", "Event"),
    threshold: int = RNN_THRESHOLD,
) -> DataFrame:
    """Routing table: key columns + ``model_type`` + ``total_samples``."""
    return df.groupBy(*key).agg(F.count(F.lit(1)).alias("total_samples")).withColumn(
        "model_type",
        F.when(F.col("total_samples") >= threshold, "rnn").otherwise("xgb"),
    )


def with_model_type(
    df: DataFrame,
    routing: DataFrame,
    key: Sequence[str] = ("Currency", "Event"),
) -> DataFrame:
    """Broadcast-join the routing table onto rows; misses → 'xgb'."""
    r = routing.select(*key, "model_type")
    return df.join(F.broadcast(r), on=list(key), how="left").withColumn(
        "model_type", F.coalesce(F.col("model_type"), F.lit("xgb"))
    )
