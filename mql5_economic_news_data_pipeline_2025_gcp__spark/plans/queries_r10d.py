"""Round-10d batch: transformWithState ListState — the interval-union
twin on the Spark-4 state API.

``stream_interval_union_tws`` — per-user union-of-intervals coverage
with the merged disjoint segments held in a NAMED, TYPED ``ListState``
of (s_us, e_us) structs plus a ``ValueState`` counter, instead of the
applyInPandasWithState form's one opaque parallel-array tuple
(``stream_interval_union``). This is the state shape the new API
exists for: the store sees a list it can iterate per element (RocksDB
column family per variable) rather than deserializing a monolithic
blob each read — though note the merge itself still put()s the full
list per batch, since interval merging can rewrite interior segments
(the O(Δ) appendList fast path needs append-only state). Exactness is
inherited: merged disjoint segments are invariant to micro-batch
split and arrival order, so the batch sweep SQL remains a true oracle,
and the pair (`stream_interval_union`, `stream_interval_union_tws`)
differentially pins BOTH state APIs against the same SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "stream_interval_union_tws",
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
    description="interval-union coverage on the Spark-4 state API "
    "(transformWithStateInPandas): merged disjoint segments in a "
    "typed ListState + ValueState counter, RocksDB column family per "
    "variable — exact under any micro-batch split, same batch-sweep "
    "oracle as the applyInPandasWithState twin",
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_interval_union_tws(spark, sf_dir):
    from ..streaming.stateful import interval_union_tws

    raw = interval_union_tws(spark, sf_dir)
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
