"""Gates for the Python Data Source WRITE path
(sources/pysource.py::JsonlSinkDataSource): executor-side part writes,
driver-side manifest commit, round-trip fidelity.
"""

from __future__ import annotations

import json
import os

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.pysource import (
    register_sink,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_sink_round_trip_and_manifest(spark, tmp_path):
    register_sink(spark)
    out = str(tmp_path / "sinkout")
    src = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(500)
    )
    src.write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()

    # manifest names exactly the written parts and the exact row count
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    assert manifest["parts"] == parts
    assert manifest["rows"] == 500

    # round-trip: read the jsonl back and compare the full multiset
    got = spark.read.json(os.path.join(out, "part-*.jsonl"))
    want = {
        (int(r["event_id"]), int(r["user_id"]), r["event_type"],
         None if r["value"] is None else round(float(r["value"]), 6))
        for r in src.collect()
    }
    have = {
        (int(r["event_id"]), int(r["user_id"]), r["event_type"],
         None if r["value"] is None else round(float(r["value"]), 6))
        for r in got.collect()
    }
    assert have == want


def test_jsonl_sink_requires_path(spark):
    register_sink(spark)
    df = spark.range(3)
    with pytest.raises(Exception, match="path"):
        df.write.format("jsonl_sink").mode("append").save()


def test_jsonl_sink_abort_tolerates_failed_task_messages(tmp_path):
    """Per the DataSourceWriter contract, a failed task's slot in the
    commit-message list is None — abort() must skip it and still remove
    the files the SUCCESSFUL attempts left behind."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.pysource import (
        _JsonlCommit,
        _JsonlWriter,
    )
    from pyspark.sql.types import StructType

    out = tmp_path / "abortout"
    out.mkdir()
    ok_part = out / "part-deadbeef.jsonl"
    ok_part.write_text('{"a": 1}\n')
    writer = _JsonlWriter(
        {"path": str(out)}, StructType([]), overwrite=False
    )
    writer.abort([_JsonlCommit(ok_part.name, 1), None])
    assert not ok_part.exists()


def test_jsonl_sink_overwrite_prunes_stale_parts(spark, tmp_path):
    """mode('overwrite') must leave ONLY this save's parts: a glob
    reader (part-*.jsonl) may never see rows from a prior save."""
    register_sink(spark)
    out = str(tmp_path / "ow")
    spark.range(10).selectExpr("id AS a").write.format(
        "jsonl_sink"
    ).option("path", out).mode("append").save()
    first_parts = {
        f for f in os.listdir(out) if f.startswith("part-")
    }
    assert first_parts
    spark.range(3).selectExpr("id + 100 AS a").write.format(
        "jsonl_sink"
    ).option("path", out).mode("overwrite").save()
    left = {f for f in os.listdir(out) if f.startswith("part-")}
    assert not (left & first_parts), "stale parts survived overwrite"
    got = sorted(
        int(r["a"])
        for r in spark.read.json(os.path.join(out, "part-*.jsonl")).collect()
    )
    assert got == [100, 101, 102]
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert sorted(manifest["parts"]) == sorted(left)
    assert manifest["rows"] == 3


def test_jsonl_sink_append_merges_manifest(spark, tmp_path):
    """A second mode('append') save must keep the first save's parts in
    the manifest — a manifest reader may never silently lose committed
    rows."""
    register_sink(spark)
    out = str(tmp_path / "ap")
    spark.range(4).selectExpr("id AS a").write.format(
        "jsonl_sink"
    ).option("path", out).mode("append").save()
    spark.range(2).selectExpr("id + 50 AS a").write.format(
        "jsonl_sink"
    ).option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    on_disk = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    assert manifest["parts"] == on_disk
    assert manifest["rows"] == 6
    assert sum(manifest["rows_per_part"].values()) == 6
