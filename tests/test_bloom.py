"""Bloom-filter artifact (operators/bloom.py): zero false negatives,
bounded false positives, partitioning-independent bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    optimal_params,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_and_bounded_fp(spark):
    docs = load_table(spark, SF, "documents")
    members = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat_ws("|", "source", F.col("doc_id").cast("string")).alias("v")
    )
    n = members.count()
    m, k = optimal_params(n, fp_rate=0.01)
    filt = bloom_build(members, "v", m, k)

    probe = docs.select(
        F.concat_ws("|", "source", F.col("doc_id").cast("string")).alias("v"),
        (F.col("doc_id") % 3 == 0).alias("is_member"),
    )
    out = bloom_contains(probe, "v", filt, m, k)
    agg = out.agg(
        F.sum(
            F.when(F.col("is_member") & ~F.col("maybe_member"), 1).otherwise(0)
        ).alias("fn"),
        F.sum(
            F.when(~F.col("is_member") & F.col("maybe_member"), 1).otherwise(0)
        ).alias("fp"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).alias("neg"),
    ).first()
    assert agg["fn"] == 0, "Bloom filters must never produce false negatives"
    # generous 5x headroom over the 1% design rate on a small sample
    assert agg["fp"] <= max(3, 0.05 * agg["neg"]), (agg["fp"], agg["neg"])


def test_filter_bytes_partitioning_independent(spark):
    docs = load_table(spark, SF, "documents")
    members = docs.select(F.col("doc_id").cast("string").alias("v"))
    m, k = optimal_params(500, 0.01)
    a = bloom_build(members, "v", m, k)
    b = bloom_build(members.repartition(11), "v", m, k)
    assert a == b


def test_membership_pass_is_map_only(spark):
    """The apply side must not shuffle: broadcast bits + one Arrow pass."""
    docs = load_table(spark, SF, "documents")
    members = docs.limit(100).select(F.col("doc_id").cast("string").alias("v"))
    m, k = optimal_params(100, 0.01)
    filt = bloom_build(members, "v", m, k)
    probe = docs.select(F.col("doc_id").cast("string").alias("v"))
    out = bloom_contains(probe, "v", filt, m, k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_bloom_decontaminate_brackets_exact(spark):
    """Registry query invariants: bloom-flagged ⊇ exact-flagged per
    source (no false negatives), and the overcount stays small."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    rows = (
        REGISTRY["doc_bloom_decontaminate"].spark_fn(spark, SF).collect()
    )
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    total_over = 0
    for r in rows:
        assert r["n_bloom"] >= r["n_exact"], r
        total_over += r["n_bloom"] - r["n_exact"]
    assert total_over <= max(3, 0.05 * total_docs), (total_over, total_docs)
