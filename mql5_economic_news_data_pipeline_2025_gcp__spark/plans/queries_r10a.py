"""Round-10a batch: the transformWithState twin, un-gated.

``stream_series_state_tws`` — the Spark 4 arbitrary-state API
(``transformWithStateInPandas``: typed state variables on a handle,
per-key timers, RocksDB column families) running the SAME per-series
bookkeeping as the ``applyInPandasWithState`` query
``stream_series_state``, against the SAME batch oracle. Rounds 1–9
kept it out of the registry behind an environment gate (no importable
``google.protobuf`` for the state server's wire protocol);
``compat.ensure_protobuf`` now discovers the image's vendored runtime
and exports it to the JVM-spawned workers, so the modern state API has
first-class in-container coverage: a registry entry, an oracle pair,
and the pytest differential twin
(``tests/test_streaming_semantics.py::test_series_state_tws_matches_batch``).

Scale notes: state is one typed ValueState per (user_id, event_type)
— |series|-bounded, RocksDB-backed past executor memory, changelog
checkpointing; output is update-mode deltas of changed keys only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "stream_series_state_tws",
    oracle="""
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_c,
           CAST(max(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hwm_ts
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    description=(
        "transformWithStateInPandas stateful operator (Spark 4 state "
        "API: typed ValueState + RocksDB column families): per-series "
        "running count / max-cents / high-water-mark advanced across "
        "micro-batches — the modernized twin of stream_series_state "
        "(applyInPandasWithState), checked against the same batch "
        "GROUP BY oracle; O(1) typed state per key"
    ),
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_series_state_tws(spark, sf_dir):
    from ..streaming.stateful import series_state_tws

    raw = series_state_tws(spark, sf_dir)
    # update-mode sinks append one row per key per batch; keep the
    # latest (n is cumulative, so max-n struct = final state)
    latest = raw.groupBy("user_id", "event_type").agg(
        F.max(F.struct("n", "max_c", "hwm_ts")).alias("s")
    )
    return latest.select(
        "user_id",
        "event_type",
        F.col("s.n").alias("n"),
        F.col("s.max_c").alias("max_c"),
        F.col("s.hwm_ts").alias("hwm_ts"),
    )
