"""Round-6 continuation (batch p): exact stateful streaming
interval-union.

The drain result equals the batch sweep (`evt_interval_coverage`)
because the operator's state is the MERGED SEGMENT LIST, exact under
any micro-batch split — so the batch SQL is a true oracle for the
streaming drain, the same differential discipline as
`stream_series_state`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "stream_interval_union",
    oracle=r"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts)
               + (abs(CAST(round(value * 100) AS BIGINT)) % 3600)
                 * 1000000 AS e_us
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT user_id, s_us, e_us,
             max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
      FROM iv)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(CASE
                 WHEN prev_max IS NULL OR prev_max < s_us
                   THEN e_us - s_us
                 WHEN prev_max < e_us THEN e_us - prev_max
                 ELSE 0 END) AS BIGINT) AS covered_us
    FROM g GROUP BY user_id
    """,
    description="custom stateful streaming interval-union "
    "(applyInPandasWithState, merged-segment-list state - exact under "
    "any micro-batch split): per-user covered microseconds, drain "
    "equals the batch sweep so evt_interval_coverage's SQL is its "
    "oracle",
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_interval_union(spark, sf_dir):
    from ..streaming.stateful import stream_interval_union as run

    raw = run(spark, sf_dir)
    # update-mode sinks append one row per key per batch; the final
    # state row has the max interval count
    latest = raw.groupBy("user_id").agg(
        F.max(F.struct("n_intervals", "covered_us")).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.n_intervals").alias("n_intervals"),
        F.col("s.covered_us").alias("covered_us"),
    )
