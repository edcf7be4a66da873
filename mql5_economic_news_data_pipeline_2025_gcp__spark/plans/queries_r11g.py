"""Round-11g batch: the STREAMING write path of the Python Data Source
connector enters the registry.

``stream_pysink_roundtrip`` — round 10 added the batch write half
(`_JsonlWriter`, two-phase commit with a `_MANIFEST`); this round adds
the streaming half (`_JsonlStreamWriter`: per-micro-batch two-phase
commit, `_BATCH_<id>` manifests, batch-id idempotence under replay —
the exactly-once discipline of `txn.append_exactly_once` at the
connector seam). This query drives the full loop: synthetic stream
reader → streaming jsonl sink → committed-parts read-back → aggregate.
Because the generator rows are pure md5 functions of their row ids,
the DuckDB oracle re-derives the exact committed dataset from
``range()`` — a dropped, duplicated or orphaned part breaks the id
checksum. Connector surface now: batch read (`src_pydatasource_agg`),
streaming read (`stream_pydatasource_counts`), batch write
(pytest-gated `_MANIFEST` contract), streaming write (this, plus the
replay-idempotence pytest in test_pysource_stream_sink.py).
"""

from __future__ import annotations

from .registry import register

_N_ROWS = 2000


@register(
    "stream_pysink_roundtrip",
    oracle=f"""
    WITH g AS (
      SELECT i AS event_id,
             (['view', 'click', 'purchase', 'signup'])[
               (CAST(('0x' || substring(md5(CAST(i AS VARCHAR)), 5, 1))
                     AS BIGINT) % 4) + 1] AS event_type,
             CAST(('0x' || substring(md5(CAST(i AS VARCHAR)), 6, 7))
                  AS BIGINT) % 1000000 AS value_c
      FROM range(0, {_N_ROWS}) r(i))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value_c) AS BIGINT) AS value_sum_c,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM g GROUP BY event_type
    """,
    description=(
        "round trip through BOTH halves of the Python Data Source "
        "connector: bounded synthetic stream → streaming jsonl sink "
        "(per-micro-batch two-phase commit, _BATCH_<id> manifests, "
        "batch-id idempotence under replay) → committed-parts "
        "read-back → per-type aggregate with an id checksum pinning "
        "the EXACT row set against the oracle's range() re-derivation "
        "— a dropped, duplicated or orphaned part file breaks the "
        "checksum. The sf_dir is deliberately unused: the connector "
        "IS the data"
    ),
    tags=("streaming", "sources", "connector", "sinks"),
)
def stream_pysink_roundtrip(spark, sf_dir):
    from ..streaming.ingest import stream_pysink_roundtrip as _impl

    return _impl(spark, n_rows=_N_ROWS)
