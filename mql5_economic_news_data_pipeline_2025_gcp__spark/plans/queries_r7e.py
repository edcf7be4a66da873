"""Round-7 batch e: streaming session windows + scalar-quantization
error profile.

`stream_session_values` complements the append-mode
`stream_session_windows` with a COMPLETE-mode drain (every session,
value sums, and the exact range-overlap merge boundary pinned; cf.
`evt_sessionize`). `emb_sq_error_profile` pins the int8
scalar-quantization arithmetic the `emb_sq_topk` ANN path rounds
through, per dimension, as an oracle-paired reconstruction-error
report.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import t
from .queries_r6 import _qvec
from .registry import register


@register(
    "stream_session_values",
    # Spark's session semantics: each event spans [ts, ts+gap); sessions
    # merge iff ranges OVERLAP, so an event at exactly prev+gap starts a
    # NEW session — the oracle's boundary is therefore >= gap (note the
    # batch evt_sessionize uses the other textbook convention, > gap).
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS value_c,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts, value_c,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM gaps),
    sessions AS (
      SELECT user_id, ts, value_c,
             sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged)
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value_c) AS BIGINT) AS value_c_sum
    FROM sessions GROUP BY user_id, session_id
    """,
    description=(
        "streaming SESSION windows (30-min dynamic gap) per user via "
        "session_window + watermark — the state-store family where "
        "windows MERGE as events arrive (tumbling/sliding state is "
        "keyed by fixed grid cells; session state must coalesce "
        "adjacent entries, which is why it gets its own StateStore "
        "layout). Drained complete; the DuckDB oracle replays the "
        "exact range-overlap semantics batch-side (new session iff "
        "gap >= 30 min — an event at exactly prev+gap does NOT "
        "overlap [prev, prev+gap)). State is dropped past the "
        "watermark in a live deployment; output is bounded by closed "
        "sessions per user"
    ),
    tags=("streaming", "window", "session"),
)
def stream_session_values(spark, sf_dir):
    from ..streaming.ingest import _drain_to_table, _events_stream

    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_c_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "value_c_sum",
        )
    )
    return _drain_to_table(agg, mode="complete")


@register(
    "emb_sq_error_profile",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    mm AS (
      SELECT idx, CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx
      FROM ve GROUP BY idx),
    coded AS (
      SELECT v.idx, mm.mn, mm.mx,
             CASE WHEN mm.mx > mm.mn
                  THEN CAST(round((v.x - mm.mn)
                           / ((mm.mx - mm.mn) / 255.0)) AS BIGINT)
                  ELSE 0 END AS code,
             v.x
      FROM ve v JOIN mm ON mm.idx = v.idx),
    erred AS (
      SELECT idx, mn, mx, code,
             abs((mn + code * ((mx - mn) / 255.0)) - x) AS err
      FROM coded)
    SELECT CAST(idx AS BIGINT) AS dim,
           CAST(min(mn) AS BIGINT) AS min_x,
           CAST(max(mx) AS BIGINT) AS max_x,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
           max(err) AS max_abs_err
    FROM erred GROUP BY idx
    """,
    description=(
        "per-dimension int8 scalar-quantization error profile: each "
        "dim's [min, max] range is cut into 255 codes, every component "
        "is encoded and reconstructed, and the report shows code "
        "occupancy and the worst absolute reconstruction error — the "
        "calibration readout that decides whether SQ8 is safe for an "
        "embedding column before routing ANN through emb_sq_topk. "
        "Codes and errors are single identical expression trees over "
        "integer milli-components (one division chain, max is "
        "order-independent). Shape: one posexplode pass → 64-row "
        "min/max agg → broadcast back → 64-row profile fold"
    ),
    tags=("embeddings", "quantization"),
)
def emb_sq_error_profile(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    ve = emb.select(F.posexplode("qv").alias("idx0", "x")).select(
        (F.col("idx0") + 1).alias("idx"), "x"
    )
    mm = ve.groupBy("idx").agg(
        F.min("x").cast("bigint").alias("mn"),
        F.max("x").cast("bigint").alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("x") - F.col("mn")) / scale, 0).cast("bigint"),
    ).otherwise(F.lit(0))
    coded = ve.join(F.broadcast(mm), "idx").select(
        "idx", "mn", "mx", code.alias("code"), "x"
    )
    err = F.abs(
        (F.col("mn") + F.col("code") * scale) - F.col("x")
    )
    return coded.groupBy("idx").agg(
        F.min("mn").cast("bigint").alias("min_x"),
        F.max("mx").cast("bigint").alias("max_x"),
        F.countDistinct("code").cast("bigint").alias("n_codes"),
        F.max(err).alias("max_abs_err"),
    ).select(
        F.col("idx").cast("bigint").alias("dim"),
        "min_x",
        "max_x",
        "n_codes",
        "max_abs_err",
    )
