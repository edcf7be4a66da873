"""Prove the plan-audit counters are LIVE, not structurally zero.

Round-9 verdict task 4: `reused_exchanges == 0` across all PLAN_AUDIT
rows was suspicious. Root cause (measured): under AQE, exchange reuse
happens at runtime — the pre-execution plan string NEVER contains
``ReusedExchange`` — so the old counter read 0 by construction. The
audit now counts reuse from a static (AQE-off) build where Catalyst's
``ReuseExchange`` rule fires at planning time. This module pins the
counter against plans with KNOWN reuse (positive control), known
non-reuse (negative control), and a registry query whose SCALE.md
entry claims exchange reuse; plus the exact exchange count behind the
SCALE.md round-9ai "5 → 3" claim.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts")
)

from plan_audit import (  # noqa: E402
    RUNTIME_REUSE_CLAIMS,
    runtime_reused_exchanges,
    static_reused_exchanges,
)

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_counter_positive_control(spark):
    """An aggregate self-joined on its own grouping key reuses ONE
    shuffle — the counter must see it (≥1), proving it is live."""

    def fn(spark, _sf):
        df = spark.range(10000).withColumn("k", F.col("id") % 100)
        agg = df.groupBy("k").agg(F.sum("id").alias("s"))
        return (
            agg.alias("a")
            .join(agg.alias("b"), "k")
            .select("k", F.col("a.s"), (F.col("b.s") * 2).alias("s2"))
        )

    assert static_reused_exchanges(spark, fn, SF) >= 1


def test_counter_negative_control(spark):
    """A single linear aggregate has nothing to reuse — the counter
    must read 0 (it doesn't just always fire)."""

    def fn(spark, _sf):
        df = spark.range(10000).withColumn("k", F.col("id") % 100)
        return df.groupBy("k").agg(F.sum("id").alias("s"))

    assert static_reused_exchanges(spark, fn, SF) == 0


def test_counter_restores_aqe(spark):
    """The AQE toggle must not leak into the shared session."""
    before = spark.conf.get("spark.sql.adaptive.enabled")
    static_reused_exchanges(
        spark, lambda s, _: s.range(10).groupBy().count(), SF
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == before


def test_runtime_reuse_claims_measured_by_audit(spark):
    """SCALE.md claims exchange reuse for these queries ('both join
    sides reuse one exchange'; 'inverted count agg and the join-back
    share the shingle key'). Under AQE that reuse is a RUNTIME decision
    — the audit's runtime path must measure ≥1 on each claimed query,
    so PLAN_AUDIT.json carries evidence, not assumption."""
    for name in RUNTIME_REUSE_CLAIMS:
        spec = REGISTRY[name]
        n = runtime_reused_exchanges(spark, spec.spark_fn, SF)
        assert n >= 1, f"{name}: SCALE.md claims reuse, measured {n}"


def test_word_bigram_entropy_exchange_count_matches_scale_claim(spark):
    """SCALE.md round-9ai claims the checkpointed bigram frame cut the
    plan from 5 exchanges to 3 — assert the MEASURED count is exactly
    3 (a budget ceiling alone would silently accept 0/1/2, letting the
    written claim drift from the plan)."""
    plan = (
        REGISTRY["doc_word_bigram_entropy"]
        .spark_fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = plan.count("Exchange hashpartitioning")
    assert n == 3, f"SCALE.md claims 3 exchanges, measured {n}"
