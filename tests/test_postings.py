"""Materialized positional-postings index: build + phrase-search
equivalence with the query-time lead() form, and scan pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.textops import (
    build_postings,
    phrase_search_postings,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_postings_phrase_equals_lead_form(spark, tmp_path):
    """Searching the materialized index returns exactly what the
    query-time lead() form computes."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "postings")
    build_postings(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    got = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_search_postings(postings, "table", "window").collect()
    }
    want = {
        (r["doc_id"], r["n_occ"])
        for r in REGISTRY["doc_phrase_search"].spark_fn(spark, SF).collect()
    }
    assert got == want


def test_postings_term_filter_pushdown(spark, tmp_path):
    """The term filter reaches the postings scan (the whole point of
    materializing the index: never re-read the corpus)."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "postings")
    build_postings(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    q = phrase_search_postings(postings, "table", "window")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    frag = plan.split("PushedFilters")[1][:150]
    assert "term" in frag, frag
