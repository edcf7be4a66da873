"""Round-11c batch: privacy-audit operators — l-diversity and Mondrian
median cuts — completing the anonymization toolkit around
`evt_k_anonymity_audit` (group sizes), `evt_dp_contribution_bounds`
(sensitivity capping) and `evt_ldp_frequency` (randomized response).

``evt_l_diversity`` — k-anonymity's classic blind spot is a large
group that is homogeneous in the SENSITIVE attribute (Machanavajjhala
et al. 2007): everyone in the group is re-identified-by-implication
even though k is high. Per quasi-identifier group (user bucket ×
epoch-anchored weekday) this emits group size k, distinct-l over the
sensitive attribute (event_type), and the modal sensitive count — the
three integers from which distinct-l-diversity and the recursive
(c,l) criterion are both assembled.

``evt_mondrian_cuts`` — the Mondrian top-down greedy partitioner
(LeFevre et al. 2006), two levels deep on (user_id, hour): cut 1 at
the global lower-median user_id, cut 2 inside each half at the half's
lower-median hour; leaves carry their actual generalization box
(min/max per dim) and size k. Medians are RANK-based on value-level
cumulative counts — the cum-count frames are dimension-bounded
(≤|users|, ≤|halves|·24 rows), so the global/ per-half windows run on
tiny aggregates, never on facts (the SCALE.md global-window rule).
Deterministic: lower median (rank = (n+1) div 2) on integer dims,
no float ever enters a cut.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_EPOCH_DAY = "2024-01-01"


@register(
    "evt_l_diversity",
    oracle=f"""
    WITH labeled AS (
      SELECT CAST(user_id % 50 AS BIGINT) AS qi_bucket,
             CAST(datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE))
                  % 7 AS BIGINT) AS weekday,
             event_type
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '{_EPOCH_DAY}'),
    cells AS (
      SELECT qi_bucket, weekday, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM labeled GROUP BY 1, 2, 3)
    SELECT qi_bucket, weekday,
           CAST(sum(n) AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS l_distinct,
           CAST(max(n) AS BIGINT) AS max_sensitive_n
    FROM cells GROUP BY 1, 2
    """,
    description=(
        "l-diversity audit per quasi-identifier group (user bucket × "
        "weekday): group size k, distinct sensitive values l, and the "
        "modal sensitive count — k-anonymity's homogeneity blind spot "
        "made measurable (the gate pins the pigeonhole identities "
        "l·max ≥ k ≥ l and assembles the recursive (c,l) criterion). "
        "Shape: one (QI, sensitive) fold then a ≤|buckets|·7-row "
        "re-aggregate — two map-side-combining exchanges, no windows"
    ),
    tags=("events", "privacy", "audit"),
)
def evt_l_diversity(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.to_date("ts") >= F.lit(_EPOCH_DAY).cast("date")
    )
    cells = ev.groupBy(
        (F.col("user_id") % 50).cast("bigint").alias("qi_bucket"),
        (
            F.datediff(F.to_date("ts"), F.lit(_EPOCH_DAY).cast("date")) % 7
        )
        .cast("bigint")
        .alias("weekday"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return cells.groupBy("qi_bucket", "weekday").agg(
        F.sum("n").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.max("n").cast("bigint").alias("max_sensitive_n"),
    )


@register(
    "evt_mondrian_cuts",
    oracle="""
    WITH pts AS (
      SELECT CAST(user_id AS BIGINT) AS u,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
      FROM events),
    ucnt AS (
      SELECT u, count(*) AS c FROM pts GROUP BY u),
    ucum AS (
      SELECT u, sum(c) OVER (ORDER BY u) AS cum,
             sum(c) OVER () AS total
      FROM ucnt),
    med_u AS (
      SELECT min(u) AS mu FROM ucum WHERE cum >= (total + 1) // 2),
    halved AS (
      SELECT p.u, p.h,
             CASE WHEN p.u <= m.mu THEN 0 ELSE 1 END AS half
      FROM pts p CROSS JOIN med_u m),
    hcnt AS (
      SELECT half, h, count(*) AS c FROM halved GROUP BY half, h),
    hcum AS (
      SELECT half, h,
             sum(c) OVER (PARTITION BY half ORDER BY h) AS cum,
             sum(c) OVER (PARTITION BY half) AS total
      FROM hcnt),
    med_h AS (
      SELECT half, min(h) AS mh FROM hcum
      WHERE cum >= (total + 1) // 2 GROUP BY half),
    leaves AS (
      SELECT v.half,
             CASE WHEN v.h <= m.mh THEN 0 ELSE 1 END AS leaf,
             v.u, v.h
      FROM halved v JOIN med_h m ON m.half = v.half)
    SELECT CAST(half AS BIGINT) AS half, CAST(leaf AS BIGINT) AS leaf,
           CAST(min(u) AS BIGINT) AS u_lo, CAST(max(u) AS BIGINT) AS u_hi,
           CAST(min(h) AS BIGINT) AS h_lo, CAST(max(h) AS BIGINT) AS h_hi,
           CAST(count(*) AS BIGINT) AS k
    FROM leaves GROUP BY half, leaf
    """,
    description=(
        "two-level Mondrian k-anonymity partitioner on (user_id, "
        "hour): rank-based lower-median cuts (global on user, then "
        "per-half on hour), leaves emitted with their actual "
        "generalization box and size — the greedy multidimensional "
        "recoding that turns the k-anonymity AUDIT into an "
        "anonymization PLAN. Medians come from value-level cumulative "
        "counts, so every window runs on a dimension-bounded frame "
        "(≤|users|, ≤2·24 rows) and facts only ever see two "
        "broadcast-literal half/leaf assignments and one box "
        "aggregate"
    ),
    tags=("events", "privacy", "operators"),
)
def evt_mondrian_cuts(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    # ONE fact fold into the ≤|users|·24 (u, h) cell frame; every
    # median, assignment and box below runs on this checkpointed
    # dimension-bounded aggregate — facts are scanned exactly once
    cells = (
        ev.select(
            F.col("user_id").cast("bigint").alias("u"),
            F.hour("ts").cast("bigint").alias("h"),
        )
        .groupBy("u", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    # value-level cum counts: the global window is over ≤|users| rows
    ucnt = cells.groupBy("u").agg(F.sum("c").alias("c"))
    wu = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, 0)
    ucum = ucnt.select(
        "u",
        F.sum("c").over(wu).alias("cum"),
        F.sum("c").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    med_u = ucum.filter(
        F.col("cum") >= F.expr("(total + 1) div 2")
    ).agg(F.min("u").alias("mu"))
    halved = cells.crossJoin(F.broadcast(med_u)).select(
        "u",
        "h",
        "c",
        F.when(F.col("u") <= F.col("mu"), 0).otherwise(1).alias("half"),
    )
    hcnt = halved.groupBy("half", "h").agg(F.sum("c").alias("c"))
    wh = Window.partitionBy("half").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hcum = hcnt.select(
        "half",
        "h",
        F.sum("c").over(wh).alias("cum"),
        F.sum("c").over(Window.partitionBy("half")).alias("total"),
    )
    med_h = (
        hcum.filter(F.col("cum") >= F.expr("(total + 1) div 2"))
        .groupBy("half")
        .agg(F.min("h").alias("mh"))
    )
    leaves = halved.join(F.broadcast(med_h), "half").select(
        "half",
        F.when(F.col("h") <= F.col("mh"), 0).otherwise(1).alias("leaf"),
        "u",
        "h",
        "c",
    )
    return leaves.groupBy(
        F.col("half").cast("bigint").alias("half"),
        F.col("leaf").cast("bigint").alias("leaf"),
    ).agg(
        F.min("u").cast("bigint").alias("u_lo"),
        F.max("u").cast("bigint").alias("u_hi"),
        F.min("h").cast("bigint").alias("h_lo"),
        F.max("h").cast("bigint").alias("h_hi"),
        F.sum("c").cast("bigint").alias("k"),
    )
