"""Round-11d batch: class-rebalancing synthesis — bucketed SMOTE
midpoints.

``evt_smote_bucketed`` — SMOTE (Chawla et al. 2002) synthesizes
minority-class training rows by interpolating each minority sample
with a near neighbor. The textbook form needs a kNN pass over the
minority set — quadratic if done by pairs. This operator is the
scale-first restatement: neighbors are searched inside (user, hour)
BUCKETS (the sign-LSH/IVF cell discipline of the ANN family), and
within a bucket the 1-D nearest neighbor by cent value is simply the
ADJACENT ROW in sorted order — lag/lead on one window, NO pair frame
at any volume. Each minority ('error') event with at least one bucket
sibling emits one synthetic row at the integer midpoint with its
nearer neighbor (ties to the predecessor; value_c ≥ 0 is enforced so
`div`/`//` agree across engines — Spark truncates toward zero, DuckDB
floors, identical on non-negatives).

Determinism: bucket order is (value_c, event_id) — permutation-exact;
nearer-neighbor choice compares exact integer gaps with a
predecessor tie-break; midpoints are integer `div 2`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_MINORITY = "error"


@register(
    "evt_smote_bucketed",
    oracle=f"""
    WITH minority AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             event_id, CAST(round(value*100) AS BIGINT) AS v
      FROM events
      WHERE event_type = '{_MINORITY}' AND value IS NOT NULL
        AND CAST(round(value*100) AS BIGINT) >= 0),
    nbr AS (
      SELECT user_id, hour, event_id, v,
             lag(v) OVER w AS pv, lag(event_id) OVER w AS pid,
             lead(v) OVER w AS nv, lead(event_id) OVER w AS nid
      FROM minority
      WINDOW w AS (PARTITION BY user_id, hour ORDER BY v, event_id)),
    chosen AS (
      SELECT user_id, hour, event_id, v,
             CASE WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  WHEN (v - pv) <= (nv - v) THEN pv ELSE nv END AS nn_v,
             CASE WHEN pv IS NULL THEN nid
                  WHEN nv IS NULL THEN pid
                  WHEN (v - pv) <= (nv - v) THEN pid ELSE nid END AS nn_id
      FROM nbr)
    SELECT user_id, hour, event_id,
           CAST(nn_id AS BIGINT) AS nn_event_id,
           CAST((v + nn_v) // 2 AS BIGINT) AS synth_value_c
    FROM chosen WHERE nn_v IS NOT NULL
    """,
    description=(
        "bucketed SMOTE: one synthetic minority ('error') row per "
        "event with a (user, hour)-bucket sibling, at the exact "
        "integer cent midpoint with its nearer 1-D value neighbor — "
        "the class-rebalancing synthesis step of a training pipeline "
        "with the kNN replaced by adjacent-rank lookup on ONE window "
        "(no pair frame at any volume; the bucket join IS the LSH "
        "cell discipline of the ANN family). Ties to predecessor, "
        "(value, event_id) ordering, integer div midpoints"
    ),
    tags=("events", "ml", "sampling"),
)
def evt_smote_bucketed(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    minority = ev.filter(
        (F.col("event_type") == _MINORITY)
        & F.col("value").isNotNull()
        & (F.col("value_c") >= 0)
    ).select(
        "user_id",
        F.hour("ts").cast("bigint").alias("hour"),
        "event_id",
        F.col("value_c").alias("v"),
    )
    w = Window.partitionBy("user_id", "hour").orderBy("v", "event_id")
    nbr = minority.select(
        "user_id",
        "hour",
        "event_id",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lag("event_id").over(w).alias("pid"),
        F.lead("v").over(w).alias("nv"),
        F.lead("event_id").over(w).alias("nid"),
    )
    v, pv, nv = F.col("v"), F.col("pv"), F.col("nv")
    take_prev = pv.isNotNull() & (
        nv.isNull() | ((v - pv) <= (nv - v))
    )
    chosen = nbr.select(
        "user_id",
        "hour",
        "event_id",
        "v",
        F.when(take_prev, pv).otherwise(nv).alias("nn_v"),
        F.when(take_prev, F.col("pid")).otherwise(F.col("nid")).alias(
            "nn_id"
        ),
    )
    return chosen.filter(F.col("nn_v").isNotNull()).select(
        "user_id",
        "hour",
        "event_id",
        F.col("nn_id").cast("bigint").alias("nn_event_id"),
        F.expr("(v + nn_v) div 2").cast("bigint").alias("synth_value_c"),
    )
