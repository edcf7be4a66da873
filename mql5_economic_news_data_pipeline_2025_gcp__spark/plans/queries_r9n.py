"""Round-9 batch n: the Count-Min sketch as a STREAMING aggregate with
fully portable register state.

``stream_cms_portable_grid`` — the d×w Count-Min grid maintained
ONLINE: each register cell is an ordinary (grid_row, j) → Σcount
streaming sum in complete mode, so the state store holds exactly the
d·w relational rows a batch GROUP BY would produce, and the drained
grid hash-matches a from-scratch SQL replay.  The streaming companion
to the batch audit ``evt_cms_portable_check`` (same salted-md5 row
hashes, wider w) and the second streaming sketch with a full value
oracle after ``stream_hll_portable_distinct`` — CMS adds the
*frequency* axis (HLL counts distinct, CMS counts occurrences), which
is what a streaming heavy-hitter alerter actually reads.

Mergeability note (the 100-TB property): CMS registers merge by
ADDITION — partial grids from any partitioning of the input (shards,
days, engines) sum cell-wise to the exact single-pass grid.  The
streaming sum aggregate IS that merge, applied micro-batch by
micro-batch; state is d·w rows regardless of key cardinality.

Determinism: cells are salted-md5 modular arithmetic (the
evt_cms_portable_check idiom); counters are exact BIGINT sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register

#: grid shape: d salted hash rows × w counters (w = 64 keeps the
#: drained table readable while giving ~N/64 expected collision mass)
_D_SALTS = ("cmsg0:", "cmsg1:", "cmsg2:", "cmsg3:")
_W = 64


@register(
    "stream_cms_portable_grid",
    oracle=f"""
    WITH rows_expanded AS (
      SELECT g.grid_row,
             CAST(('0x' || substr(md5(
                    (CASE g.grid_row WHEN 0 THEN 'cmsg0:'
                                     WHEN 1 THEN 'cmsg1:'
                                     WHEN 2 THEN 'cmsg2:'
                                     ELSE 'cmsg3:' END)
                    || CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % {_W} AS j
      FROM events e
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS grid_row) g)
    SELECT CAST(grid_row AS BIGINT) AS grid_row,
           CAST(j AS BIGINT) AS j,
           CAST(count(*) AS BIGINT) AS c
    FROM rows_expanded GROUP BY grid_row, j
    """,
    description=(
        f"Count-Min sketch grid (d={len(_D_SALTS)}, w={_W}, salted-md5 "
        "row hashes) maintained as a STREAMING aggregate: every cell "
        "is a (grid_row, j) → Σcount streaming sum in complete mode, "
        "so the state store holds exactly the d·w relational rows a "
        "batch GROUP BY produces and the drained grid hash-matches "
        "the from-scratch SQL replay. Registers merge by ADDITION — "
        "partial grids from any input partitioning sum cell-wise to "
        "the one-pass grid, and the streaming sum IS that merge per "
        "micro-batch; state is d·w rows regardless of user "
        "cardinality. The frequency-axis companion to the HLL "
        "distinct-axis streaming sketch; a heavy-hitter alerter reads "
        "min-over-rows point estimates straight off this table"
    ),
    tags=("streaming", "sketch", "aggregate"),
)
def stream_cms_portable_grid(spark, sf_dir):
    from ..operators.dedup import _base_hash
    from ..streaming.ingest import _drain_to_table, _events_stream

    ev = _events_stream(spark, sf_dir)
    key = F.col("user_id").cast("string")
    # one pass over the stream, d cells per row via an inline array
    # explode (map-side; no shuffle of raw rows beyond the grid agg)
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("grid_row"),
                        (_base_hash(F.concat(F.lit(s), key)) % _W).alias(
                            "j"
                        ),
                    )
                    for i, s in enumerate(_D_SALTS)
                ]
            )
        ).alias("cell")
    ).select("cell.grid_row", "cell.j")
    grid = cells.groupBy("grid_row", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    drained = _drain_to_table(grid, mode="complete")
    return drained.select(
        F.col("grid_row").cast("bigint").alias("grid_row"),
        F.col("j").cast("bigint").alias("j"),
        "c",
    )
