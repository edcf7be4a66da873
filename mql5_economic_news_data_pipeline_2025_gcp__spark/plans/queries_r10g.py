"""Round-10g batch: MapState — the per-user type histogram on the
Spark-4 state API, completing the typed-state quartet (ValueState:
`stream_series_state_tws`; ListState: `stream_interval_union_tws`;
event-time timers: `session_close_tws` in streaming/stateful.py;
MapState: this query).

``stream_user_type_histogram_tws`` — per-(user, type) running count
and cent total with the per-type cells point-addressable in a
``MapState`` keyed by event_type: each batch touches O(types seen in
the batch) cells instead of rewriting a per-user blob, and the state
store sees one entry per user with map semantics (RocksDB column
family). The full drain equals the batch GROUP BY — the same
differential oracle discipline as the other state-API twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "stream_user_type_histogram_tws",
    oracle="""
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    description=(
        "per-user event-type histogram (count + cent totals) with "
        "point-addressable MapState cells on the transformWithState "
        "API — O(touched types) state writes per batch, one store "
        "entry per user; full drain equals the batch GROUP BY oracle. "
        "Completes the typed-state quartet next to the ValueState / "
        "ListState / timer twins"
    ),
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_user_type_histogram_tws(spark, sf_dir):
    from ..streaming.stateful import user_type_histogram_tws

    raw = user_type_histogram_tws(spark, sf_dir)
    # update-mode sink: keep the latest running row per cell
    latest = raw.groupBy("user_id", "event_type").agg(
        F.max(F.struct("n", "sum_c")).alias("s")
    )
    return latest.select(
        "user_id",
        "event_type",
        F.col("s.n").alias("n"),
        F.col("s.sum_c").alias("sum_c"),
    )
