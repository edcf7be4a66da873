"""Round-10n batch: exact total-variation drift and duplicate-cluster
source mixing.

``evt_tv_drift`` — week-over-week total-variation distance of the
event-type mix: TV(p, q) = ½·Σ|p_t − q_t|, emitted as the EXACT
integer numerator Σ|c1_t·n2 − c2_t·n1| over the common type axis
(denominator 2·n1·n2 assembled by the gate). TV is the f-divergence
with a direct operational reading (the largest possible difference in
probability any event assigns) and is exact in integers — unlike PSI
(`evt_psi_drift`) and KL, whose logs force quantization. Consecutive
weeks pair on the INTEGER week key ⌊days-since-epoch / 7⌋ (the
single-month fixture spans ~5 weeks; month keys would be degenerate).

``doc_dup_cluster_sources`` — are exact duplicates INTRA-source
(boilerplate within a crawl) or CROSS-source (template reuse /
syndication)? Exact-dup clusters (normalized-text md5, the
`doc_exact_dedup` identity) folded by (cluster size, distinct
sources): the (size ≥ 2, n_sources ≥ 2) cells are the cross-source
contamination a per-source dedup would MISS — the measurement that
decides whether dedup must run globally or can shard by source (the
`doc_corpus_overlap` question asked at cluster granularity).

Determinism: counts and cross-products are exact integers; md5
fingerprints are engine-identical; week keys are integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register


@register(
    "evt_tv_drift",
    oracle="""
    WITH e AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS mk,
             event_type
      FROM events),
    c AS (
      SELECT mk, event_type, CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY mk, event_type),
    n AS (
      SELECT mk, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY mk),
    types AS (SELECT DISTINCT event_type FROM c),
    mm AS (SELECT DISTINCT mk FROM c),
    adj AS (SELECT mk FROM mm WHERE mk - 1 IN (SELECT mk FROM mm)),
    grid AS (
      SELECT adj.mk, t.event_type,
             coalesce(c1.c, 0) AS c1, coalesce(c2.c, 0) AS c2
      FROM adj CROSS JOIN types t
      LEFT JOIN c c1 ON c1.mk = adj.mk
                    AND c1.event_type = t.event_type
      LEFT JOIN c c2 ON c2.mk = adj.mk - 1
                    AND c2.event_type = t.event_type)
    SELECT CAST(g.mk AS BIGINT) AS week_key,
           n1.n AS n_cur, n2.n AS n_prev,
           CAST(sum(abs(g.c1 * n2.n - g.c2 * n1.n)) AS BIGINT)
             AS tv_num
    FROM grid g
    JOIN n n1 ON n1.mk = g.mk
    JOIN n n2 ON n2.mk = g.mk - 1
    GROUP BY g.mk, n1.n, n2.n
    """,
    description=(
        "week-over-week total-variation distance of the event-type "
        "mix, as the EXACT integer numerator Σ|c1·n2 − c2·n1| over "
        "the full type axis (zero cells kept; gate divides by 2·n1·n2 "
        "and pins TV ∈ [0, 1]) — the f-divergence with an operational "
        "reading and no logs to quantize, next to PSI's log-based "
        "screen. Weeks pair on integer ⌊epoch-days/7⌋ keys. Shape: "
        "one (week, type) fold, a |types|×|weeks| bounded grid, two "
        "totals joins"
    ),
    tags=("events", "drift", "statistics"),
)
def evt_tv_drift(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    mk = F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7")
    c = (
        ev.select(mk.alias("mk"), "event_type")
        .groupBy("mk", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # ≤|weeks|·|types| cells feeding five consumers below
        .localCheckpoint()
    )
    n = c.groupBy("mk").agg(F.sum("c").cast("bigint").alias("n"))
    types = c.select("event_type").distinct()
    mm = c.select("mk").distinct()
    adj = mm.join(
        mm.select((F.col("mk") + 1).alias("mk1")),
        F.col("mk") == F.col("mk1"),
    ).select("mk")
    grid = (
        adj.crossJoin(F.broadcast(types))
        .join(
            c.select("mk", "event_type", F.col("c").alias("c1")),
            ["mk", "event_type"],
            "left",
        )
        .join(
            c.select(
                (F.col("mk") + 1).alias("mk"),
                "event_type",
                F.col("c").alias("c2"),
            ),
            ["mk", "event_type"],
            "left",
        )
        .select(
            "mk",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    n1 = n.select("mk", F.col("n").alias("n_cur"))
    n2 = n.select((F.col("mk") + 1).alias("mk"), F.col("n").alias("n_prev"))
    return (
        grid.join(F.broadcast(n1), "mk")
        .join(F.broadcast(n2), "mk")
        .groupBy("mk", "n_cur", "n_prev")
        .agg(
            F.sum(
                F.abs(
                    F.col("c1") * F.col("n_prev")
                    - F.col("c2") * F.col("n_cur")
                )
            )
            .cast("bigint")
            .alias("tv_num")
        )
        .select(
            F.col("mk").cast("bigint").alias("week_key"),
            "n_cur",
            "n_prev",
            "tv_num",
        )
    )


@register(
    "doc_dup_cluster_sources",
    oracle=r"""
    WITH d AS (
      SELECT source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
               AS fp
      FROM documents),
    cl AS (
      SELECT fp,
             CAST(count(*) AS BIGINT) AS sz,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM d GROUP BY fp)
    SELECT sz, n_sources, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM cl GROUP BY sz, n_sources
    """,
    description=(
        "duplicate-cluster source mixing: exact-dup clusters "
        "(normalized-text md5) folded by (cluster size, distinct "
        "sources) with cluster and doc counts per cell — the "
        "(sz ≥ 2, n_sources ≥ 2) cells are the CROSS-source "
        "duplication a per-source (sharded) dedup would miss, the "
        "measurement that decides global-vs-sharded dedup topology; "
        "the gate replays the clustering and pins n_sources ≤ sz plus "
        "the total-doc mass identity. Shape: one map-side fingerprint "
        "pass, one fp fold, one tiny histogram fold"
    ),
    tags=("documents", "dedup", "audit"),
)
def doc_dup_cluster_sources(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    )
    cl = d.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return cl.groupBy("sz", "n_sources").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )
