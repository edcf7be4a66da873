"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 parity-plus; the arbitrary-state API the reference's
batch upsert would use for true incremental series tracking).

Per-series running state — sample count, running max, high-water-mark
timestamp — maintained across micro-batches in the state store. This is
the streaming-native form of the reference's per-(Currency,Event)
bookkeeping (TRAIN:377-389 sample counts, PUSH:160-167 high-water mark):
instead of re-scanning the table monthly, state advances per batch and
the same bookkeeping is always current.

Scale: state is partitioned by the series key across executors; each
key's state is O(1) (three scalars), so state-store size is bounded by
|series|, not |rows|. A timeout (``GroupStateTimeout``) would retire
dormant series; kept off here because the drain is finite.

Determinism: count/max/max-ts are order-independent, so a full drain
equals the batch GROUP BY — which is what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest import _drain_to_table, _stream_source

_OUT_SCHEMA = "user_id long, event_type string, n long, max_c long, hwm_ts timestamp"
_STATE_SCHEMA = "n long, max_c long, hwm_us long"


def _update_series_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, max_c, hwm_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        bmax = int(pdf["value_c"].max())
        bhwm = int(pdf["ts_us"].max())
        max_c = bmax if max_c is None else max(max_c, bmax)
        hwm_us = bhwm if hwm_us is None else max(hwm_us, bhwm)
    state.update((n, max_c, hwm_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n": [n],
            "max_c": [max_c],
            "hwm_ts": [pd.Timestamp(hwm_us, unit="us")],
        }
    )


def stream_series_running_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through per-series arbitrary state and
    return the final state table (one row per series)."""
    stream = _stream_source(spark, sf_dir, "events")
    ev = stream.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        # ns → µs epoch via integer div (exact; doubles drift past 2^53)
        F.expr("ts div 1000").alias("ts_us"),
    )
    out = ev.groupBy("user_id", "event_type").applyInPandasWithState(
        _update_series_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # full session parallelism here, unlike the pure-JVM drains: this
    # operator's cost is per-group PYTHON compute (one pandas worker per
    # state partition), not state-store commit overhead — 8 partitions
    # would cap it at 8 parallel workers (measured 3.7 s vs 2.9 s at 32)
    return _drain_to_table(out, mode="update", state_partitions=None)
