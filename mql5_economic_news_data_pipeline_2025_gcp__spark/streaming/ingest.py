"""Structured-Streaming ingest (SURVEY §2.9 parity-plus).

The reference's ingestion is monthly batch + high-water-mark filter +
natural-key upsert. The streaming-native analogue:

    readStream(file source) → event-time watermark → dropDuplicates on
    the natural key → sink (foreachBatch merge for true upsert).

``Trigger.AvailableNow`` reproduces the batch cadence: one invocation
drains everything currently in the landing prefix, then stops — exactly
the monthly-DAG semantics, but incremental and exactly-once.

At scale: the file source tracks processed files in the checkpoint (no
re-reads); dropDuplicates state is bounded by the watermark; the
foreachBatch merge rewrites only partitions that received keys.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_dedup_counts(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drive a streaming dedup + aggregate over the events parquet and
    return the materialized result (memory sink, AvailableNow-style).

    Dedup key mirrors the reference natural key: one row per
    (user_id, event_type, calendar day), then count rows per event_type.
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    arrow_schema = pq.read_schema(path)
    # build the Spark read schema: ns-timestamps arrive as long
    from pyspark.sql import types as T

    fields = []
    for f_ in arrow_schema:
        s = str(f_.type)
        if s.startswith("timestamp[ns"):
            typ: T.DataType = T.LongType()
        elif s.startswith("timestamp"):
            typ = T.TimestampType()
        elif s in ("int64", "long"):
            typ = T.LongType()
        elif s in ("int32", "int"):
            typ = T.IntegerType()
        elif s == "double":
            typ = T.DoubleType()
        elif s == "float":
            typ = T.FloatType()
        else:
            typ = T.StringType()
        fields.append(T.StructField(f_.name, typ, True))
    schema = T.StructType(fields)

    # the file stream source requires a directory; expose the single test
    # parquet through a temp dir (a real deployment points at the landing
    # prefix directly)
    import os
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="stream_events_")
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(stream_dir)
    )
    events = stream.withColumn(
        "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
    ).withColumn("event_date", F.to_date("ts"))
    deduped = events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type", "event_date"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique_keys"))

    name = "stream_out_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
