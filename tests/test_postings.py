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


def test_postings_phrase_equivalence_on_ragged_text(spark, tmp_path):
    """Equivalence must hold on UN-normalized text too (uppercase,
    repeated whitespace) — the round-4 ADVICE bug was build_postings
    tokenizing with tokens() while the lead() form split raw text, so
    the two disagreed off the pre-normalized corpus."""
    from pyspark.sql import Window

    rows = [
        (1, "table window"),
        (2, "Table window table window"),   # leading uppercase: 1 match
        (3, "table  window"),               # double space breaks adjacency
        (4, "a table window b table window"),
        (5, "window table"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "postings_ragged")
    build_postings(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    got = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_search_postings(postings, "table", "window").collect()
    }
    # the query-time lead() form, verbatim from doc_phrase_search
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    adj = toks.withColumn("nxt", F.lead("tok").over(w))
    want = {
        (r["doc_id"], r["n_occ"])
        for r in adj.filter(
            (F.col("tok") == "table") & (F.col("nxt") == "window")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
        .collect()
    }
    assert got == want == {(1, 1), (2, 1), (4, 2)}


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
