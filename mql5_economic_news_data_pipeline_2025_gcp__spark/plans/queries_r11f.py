"""Round-11f batch: the Lepage statistic's integer components and
PrefixSpan-style sequential pattern support.

``evt_lepage_components`` — Lepage (1971) combines a location rank
statistic (Wilcoxon rank sum W) with a scale rank statistic
(Ansari–Bradley's folded scores Σ min(r, N+1−r)) into one omnibus
L = Z_W² + Z_AB². With `evt_mann_whitney_u` (location only),
`evt_cucconi_test` (the quadratic-rank alternative) and
`evt_cramer_von_mises` (omnibus ECDF) this completes the classical
two-sample rank family. The registry row carries the exact integer
(n, m, W, AB) per user on tie-broken pooled ranks; the standardized
assembly — means/variances of W and AB under H₀ — lives in the gate.
Same ONE-exchange plan as the r11a pair (the pooled window is shared
machinery: `_pooled_ranked`).

``evt_seq_pattern_support`` — sequential pattern mining's defining
move vs n-gram counting (`evt_topk_paths` counts CONTIGUOUS trigrams)
is NON-CONTIGUOUS subsequence containment: a user supports (a, b, c)
iff some a-event precedes some b-event that precedes some c-event,
with any gaps. The exact support of every length-3 type pattern
(≤|types|³ = 125 rows at any volume) falls out of three bounded
frames, never a per-row DP: a user contains (a,b,c) iff
min_b{ts_b > first_a} < last_c — one per-(user, type) min/max fold,
one 5-way bounded expansion join for the middle element, one
membership aggregate. PrefixSpan's projected-database recursion
collapses to relational algebra because the alphabet is a bounded
dimension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register
from .queries_r11a import _RANK_CTE, _X, _Y, _pooled_ranked


@register(
    "evt_lepage_components",
    oracle=f"""
    WITH {_RANK_CTE},
    tot AS (SELECT user_id, count(*) AS nn FROM idx GROUP BY user_id)
    SELECT i.user_id,
           CAST(sum(CASE WHEN grp = '{_X}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n,
           CAST(sum(CASE WHEN grp = '{_Y}' THEN 1 ELSE 0 END)
                AS BIGINT) AS m,
           CAST(sum(CASE WHEN grp = '{_X}' THEN r ELSE 0 END)
                AS BIGINT) AS w_sum,
           CAST(sum(CASE WHEN grp = '{_X}'
                    THEN LEAST(r, t.nn + 1 - r) ELSE 0 END)
                AS BIGINT) AS ab_sum
    FROM idx i JOIN tot t ON t.user_id = i.user_id
    GROUP BY i.user_id
    HAVING sum(CASE WHEN grp = '{_X}' THEN 1 ELSE 0 END) > 0
       AND sum(CASE WHEN grp = '{_Y}' THEN 1 ELSE 0 END) > 0
    """,
    description=(
        "Lepage omnibus location–scale components per user (purchase "
        "vs view cents): Wilcoxon rank sum W and Ansari–Bradley "
        "folded-score sum Σ min(r, N+1−r) on tie-broken pooled ranks, "
        "exact integers; the gate standardizes both and assembles "
        "L = Z_W² + Z_AB². Completes the two-sample rank family next "
        "to Mann–Whitney, Cucconi and Cramér–von Mises. Same "
        "one-exchange one-sort pooled-rank plan as the r11a pair"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_lepage_components(spark, sf_dir):
    from pyspark.sql import Window

    idx = _pooled_ranked(spark, sf_dir)
    w = Window.partitionBy("user_id")
    with_n = idx.withColumn("nn", F.count(F.lit(1)).over(w))
    folded = F.least(F.col("r"), F.col("nn") + 1 - F.col("r"))
    parts = with_n.groupBy("user_id").agg(
        F.sum(F.when(F.col("grp") == _X, 1).otherwise(0)).alias("n"),
        F.sum(F.when(F.col("grp") == _Y, 1).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("grp") == _X, F.col("r")).otherwise(0)).alias(
            "w_sum"
        ),
        F.sum(F.when(F.col("grp") == _X, folded).otherwise(0)).alias(
            "ab_sum"
        ),
    )
    return parts.filter((F.col("n") > 0) & (F.col("m") > 0)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("m").cast("bigint").alias("m"),
        F.col("w_sum").cast("bigint").alias("w_sum"),
        F.col("ab_sum").cast("bigint").alias("ab_sum"),
    )


@register(
    "evt_seq_pattern_support",
    oracle="""
    WITH fl AS (
      SELECT user_id, event_type AS ty,
             min(epoch_us(ts)) AS first_us,
             max(epoch_us(ts)) AS last_us
      FROM events GROUP BY 1, 2),
    mid AS (
      SELECT a.user_id, a.ty AS a_ty, e.event_type AS b_ty,
             min(epoch_us(e.ts)) AS mab_us
      FROM fl a JOIN events e
        ON e.user_id = a.user_id AND epoch_us(e.ts) > a.first_us
      GROUP BY 1, 2, 3),
    hit AS (
      SELECT m.a_ty, m.b_ty, c.ty AS c_ty, m.user_id
      FROM mid m JOIN fl c
        ON c.user_id = m.user_id AND c.last_us > m.mab_us)
    SELECT a_ty, b_ty, c_ty, CAST(count(*) AS BIGINT) AS support
    FROM hit GROUP BY 1, 2, 3
    """,
    description=(
        "exact support of every length-3 NON-CONTIGUOUS event-type "
        "pattern (PrefixSpan semantics: a user supports (a,b,c) iff "
        "some a precedes some b precedes some c, any gaps — vs "
        "evt_topk_paths' contiguous trigrams): one per-(user, type) "
        "min/max fold, a ≤|types|-way bounded expansion join for the "
        "earliest-middle-after-first-a frame, one membership "
        "aggregate to ≤|types|³ rows. The projected-database "
        "recursion collapses to relational algebra because the "
        "alphabet is a bounded dimension"
    ),
    tags=("events", "sequence", "mining"),
)
def evt_seq_pattern_support(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    fl = ev.groupBy("user_id", F.col("event_type").alias("ty")).agg(
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    # |users|·|types| rows feeding the expansion join AND the c-side
    # membership join
    ).localCheckpoint()
    a = fl.select(
        "user_id", F.col("ty").alias("a_ty"), "first_us"
    )
    mid = (
        ev.join(a, "user_id")
        .filter(F.col("ts_us") > F.col("first_us"))
        .groupBy("user_id", "a_ty", F.col("event_type").alias("b_ty"))
        .agg(F.min("ts_us").alias("mab_us"))
    )
    c = fl.select("user_id", F.col("ty").alias("c_ty"), "last_us")
    hit = mid.join(c, "user_id").filter(
        F.col("last_us") > F.col("mab_us")
    )
    return hit.groupBy("a_ty", "b_ty", "c_ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )
