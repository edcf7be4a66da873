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
