"""Round-7 batch j: weighted sampling without replacement, duplicate-
graph mixing structure, and repurchase-interval profiling.

- ``doc_priority_sample`` — Efraimidis-Spirakis (A-ES) weighted
  reservoir sampling as a deterministic top-k: priority = ln(u)/w with
  u from md5 bits, so heavier docs win proportionally and BOTH engines
  draw the identical sample (the md5-uniform recipe every sampler in
  the registry shares).
- ``doc_dupgraph_assortativity`` — degree assortativity (Pearson r of
  endpoint degrees over edges) on the SAME LSH candidate graph as the
  triangle/k-core queries: r > 0 means duplicate hubs attach to hubs
  (mirror farms), r < 0 means star-shaped boilerplate centers.
- ``rel_repurchase_intervals`` — per-segment repeat-purchase gap
  profile with the doubled-median histogram trick (no fact sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import lsh_candidate_pairs, minhash_signatures_mapside
from .common import fan_out, t
from .queries_ext import _SQL_MINHASH_AGGS, _SQL_SHINGLES
from .registry import register


@register(
    "doc_priority_sample",
    oracle="""
    WITH u AS (
      SELECT doc_id, source, n_chars,
             (CAST(('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)),
                                   1, 8)) AS BIGINT) + 1)
               / 4294967297.0 AS uni
      FROM documents WHERE n_chars > 0),
    pri AS (
      SELECT doc_id, source, n_chars,
             ln(uni) / CAST(n_chars AS DOUBLE) AS key
      FROM u),
    ranked AS (
      SELECT doc_id, source, n_chars, key,
             row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rnk
      FROM pri)
    SELECT doc_id, source, n_chars,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 25
    """,
    description=(
        "Efraimidis-Spirakis weighted sampling WITHOUT replacement as a "
        "deterministic top-k: each doc draws u from its salted md5 "
        "bits, priority = ln(u)/weight (weight = n_chars, so longer "
        "docs win proportionally — ln(u)/w is the standard "
        "overflow-safe form of u^(1/w)), and the sample is the top 25 "
        "priorities with doc_id tie-break. Both engines compute the "
        "identical uniform and the identical one-division tree, so the "
        "SAMPLE ITSELF hash-matches — the property that makes a "
        "sampling pipeline reproducible across reruns and engines. "
        "Shape: map-only priority, then orderBy().limit(k) — Spark "
        "plans TakeOrderedAndProject (per-partition top-k, merged at "
        "the driver over k·partitions rows); the rank window runs on "
        "the returned 25-row frame only, so NO single-partition sort "
        "of the corpus exists anywhere in the plan"
    ),
    tags=("documents", "sampling"),
)
def doc_priority_sample(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    uni = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.log(uni) / F.col("n_chars").cast("double")).alias("key"),
    )
    top = pri.orderBy(F.col("key").desc(), F.col("doc_id").asc()).limit(25)
    w = Window.orderBy(F.col("key").desc(), F.col("doc_id").asc())
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "source", "n_chars", "rnk"
    )


@register(
    "doc_dupgraph_assortativity",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    hh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh),
    sig AS (
      SELECT doc_id, {_SQL_MINHASH_AGGS}
      FROM hh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bkey FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
      UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT id_a AS id FROM pairs
        UNION ALL SELECT id_b FROM pairs) GROUP BY id),
    ends AS (
      SELECT da.d AS x, db.d AS y
      FROM pairs p
      JOIN deg da ON da.id = p.id_a
      JOIN deg db ON db.id = p.id_b),
    sym AS (
      SELECT x, y FROM ends
      UNION ALL SELECT y, x FROM ends),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM sym)
    SELECT n AS n_edge_ends, sx AS deg_sum, sxx AS deg_sq_sum,
           sxy AS deg_prod_sum,
           CAST(n * sxy - sx * sx AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS assortativity
    FROM m
    """,
    description=(
        "degree assortativity of the LSH candidate graph: Pearson r of "
        "endpoint degrees over the SYMMETRIZED edge list (both "
        "directions, the standard Newman form — marginals of x and y "
        "are then identical, so r = (nΣxy − (Σx)²)/(nΣx² − (Σx)²), "
        "one tree over four integer moments). r > 0 = duplicate hubs "
        "attach to hubs (mirror farms), r < 0 = star-shaped "
        "boilerplate centers — with triangles (local density) and "
        "k-core (global skeleton) this completes the dup-graph "
        "structure kit. Shape: pairs checkpointed once; two broadcast "
        "degree joins and one 1-row moment fold"
    ),
    tags=("documents", "dedup", "graph"),
)
def doc_dupgraph_assortativity(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    sig = minhash_signatures_mapside(docs, n=3, num_hashes=8)
    pairs = lsh_candidate_pairs(sig, bands=4, rows_per_band=2).localCheckpoint()
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("id").alias("id_a"), F.col("d").alias("x"))
    db = deg.select(F.col("id").alias("id_b"), F.col("d").alias("y"))
    ends = pairs.join(F.broadcast(da), "id_a").join(F.broadcast(db), "id_b")
    sym = ends.select("x", "y").unionAll(
        ends.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    m = sym.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_edge_ends"),
        F.col("sx").alias("deg_sum"),
        F.col("sxx").alias("deg_sq_sum"),
        F.col("sxy").alias("deg_prod_sum"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("assortativity"),
    )


@register(
    "rel_repurchase_intervals",
    oracle="""
    WITH o AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             CAST(o.o_orderdate AS DATE) AS od, o.o_orderkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    gaps AS (
      SELECT segment,
             date_diff('day',
                       lag(od) OVER (PARTITION BY o_custkey
                                     ORDER BY od, o_orderkey),
                       od) AS gap_d
      FROM o),
    g AS (SELECT segment, CAST(gap_d AS BIGINT) AS gap_d
          FROM gaps WHERE gap_d IS NOT NULL),
    hist AS (
      SELECT segment, gap_d, CAST(count(*) AS BIGINT) AS c
      FROM g GROUP BY segment, gap_d),
    cum AS (
      SELECT segment, gap_d, c,
             sum(c) OVER (PARTITION BY segment ORDER BY gap_d
                          ROWS UNBOUNDED PRECEDING) AS cc,
             sum(c) OVER (PARTITION BY segment) AS n
      FROM hist)
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN cc >= (n + 1) // 2 THEN gap_d END)
                + min(CASE WHEN cc >= (n + 2) // 2 THEN gap_d END)
                AS BIGINT) AS median2_gap_d
    FROM cum GROUP BY segment
    """,
    description=(
        "repeat-purchase interval profile per market segment: per-"
        "customer order-date gaps (one lag window on the customer "
        "key), then the DOUBLED median (med2 = x_((n+1)/2) + "
        "x_((n+2)/2)) from the per-segment gap HISTOGRAM — the "
        "replenishment-cycle readout behind reorder reminders and "
        "churn cutoffs, integer end to end with no fact sort. Shape: "
        "broadcast dim join, one customer-key window, histogram agg "
        "(bounded by distinct gap values), per-segment fold"
    ),
    tags=("relational", "timeseries"),
)
def rel_repurchase_intervals(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = j.select(
        "segment", F.datediff(F.col("od"), F.lag("od").over(w)).alias("gap_d")
    ).filter(F.col("gap_d").isNotNull())
    hist = gaps.groupBy("segment", "gap_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("segment")
        .orderBy("gap_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("segment")
    cum = hist.select(
        "segment",
        "gap_d",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    return cum.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        (
            F.min(F.when(F.col("cc") >= lo, F.col("gap_d")))
            + F.min(F.when(F.col("cc") >= hi, F.col("gap_d")))
        )
        .cast("bigint")
        .alias("median2_gap_d"),
    )
