"""Gates for the STREAMING write path of the Python Data Source
connector (sources/pysource.py::_JsonlStreamWriter): per-micro-batch
two-phase commit, batch-id idempotence (exactly-once under replay),
and the committed-reader contract.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.types import LongType, StructField, StructType

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.pysource import (
    _JsonlCommit,
    _JsonlStreamWriter,
    committed_stream_rows,
    register,
    register_sink,
)


def test_stream_sink_end_to_end(spark, tmp_path):
    """Synthetic stream → jsonl stream sink: every row lands exactly
    once in committed parts, one _BATCH_ manifest per micro-batch."""
    register(spark)
    register_sink(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("batch_rows", "128")
        .option("max_rows", "500")
        .load()
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sdf.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        man = committed_stream_rows(out)
        if man["rows"] >= 500:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    man = committed_stream_rows(out)
    assert man["rows"] == 500
    batches = [
        p
        for p in glob.glob(os.path.join(out, "_BATCH_*"))
        if not p.endswith(".tmp")
    ]
    assert len(batches) >= 2, "multiple micro-batches expected"
    # committed parts exist on disk and hold exactly the manifest rows
    ids = []
    for part in man["parts"]:
        with open(os.path.join(out, part)) as fh:
            for line in fh:
                ids.append(json.loads(line)["event_id"])
    assert sorted(ids) == list(range(500))  # exactly-once, no dup/hole


def test_stream_commit_is_idempotent_per_batch(tmp_path):
    """A replayed batch (same batchId, fresh task attempts) must leave
    the original commit untouched and clean up its duplicate parts."""
    out = tmp_path / "sink"
    out.mkdir()
    schema = StructType([StructField("a", LongType())])
    w = _JsonlStreamWriter({"path": str(out)}, schema)

    (out / "p1.jsonl").write_text('{"a": 1}\n')
    w.commit([_JsonlCommit("p1.jsonl", 1)], batchId=7)
    man0 = json.load(open(out / "_BATCH_7"))
    assert man0["parts"] == ["p1.jsonl"]

    # replay: new attempt wrote p2, commit(7) fires again
    (out / "p2.jsonl").write_text('{"a": 1}\n')
    w.commit([_JsonlCommit("p2.jsonl", 1)], batchId=7)
    assert json.load(open(out / "_BATCH_7")) == man0  # unchanged
    assert not (out / "p2.jsonl").exists()  # duplicate discarded
    assert (out / "p1.jsonl").exists()
    assert committed_stream_rows(str(out))["rows"] == 1


def test_stream_abort_skips_none_and_cleans(tmp_path):
    out = tmp_path / "sink"
    out.mkdir()
    schema = StructType([StructField("a", LongType())])
    w = _JsonlStreamWriter({"path": str(out)}, schema)
    (out / "p1.jsonl").write_text('{"a": 1}\n')
    w.abort([_JsonlCommit("p1.jsonl", 1), None], batchId=3)
    assert not (out / "p1.jsonl").exists()
    assert committed_stream_rows(str(out))["rows"] == 0
