"""Gates for the binaryFile asset-ingestion source."""

from __future__ import annotations

import hashlib
import time

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.multimodal import (
    extract_media_meta,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.binfiles import (
    read_binary_assets,
)


@pytest.fixture
def asset_dir(tmp_path):
    sub = tmp_path / "nested"
    sub.mkdir()
    files = {
        "a.png": b"\x89PNGfake" * 40,
        "b.wav": b"RIFFfake" * 25,
        "nested/c.mp4": b"\x00\x00ftyp" * 100,
        "d.txt": b"not media",
    }
    for name, payload in files.items():
        (tmp_path / name).write_bytes(payload)
    return tmp_path, files


def test_ingest_maps_schema_and_bytes(spark, asset_dir):
    root, files = asset_dir
    df = read_binary_assets(spark, str(root)).orderBy("source_path")
    rows = {r["source_path"].split("/")[-1]: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["a.png"]["media_type"] == "image"
    assert rows["b.wav"]["media_type"] == "audio"
    assert rows["c.mp4"]["media_type"] == "video"
    assert rows["d.txt"]["media_type"] == "binary"
    for name, payload in files.items():
        base = name.split("/")[-1]
        assert bytes(rows[base]["payload"]) == payload
        assert rows[base]["n_bytes"] == len(payload)
    # asset ids unique at fixture scale
    assert len({r["asset_id"] for r in rows.values()}) == 4


def test_glob_prunes_before_read(spark, asset_dir):
    root, _ = asset_dir
    df = read_binary_assets(spark, str(root), glob="*.png")
    got = [r["media_type"] for r in df.collect()]
    assert got == ["image"]


def test_feeds_multimodal_decode(spark, asset_dir):
    root, files = asset_dir
    media = read_binary_assets(spark, str(root)).filter(
        "media_type <> 'binary'"
    )
    meta = extract_media_meta(media.select("asset_id", "media_type", "payload"))
    rows = meta.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_bytes"] > 0
        assert r["checksum"] is not None
    # checksum matches md5 of the real bytes for the wav file
    wav_payload = files["b.wav"]
    want = hashlib.md5(wav_payload).hexdigest()
    by_bytes = {r["n_bytes"]: r for r in rows}
    assert by_bytes[len(wav_payload)]["checksum"] == want


def test_modified_after_is_incremental(spark, asset_dir):
    root, _ = asset_dir
    time.sleep(1.1)
    cutoff = time.strftime("%Y-%m-%dT%H:%M:%S")
    time.sleep(1.1)
    (root / "late.png").write_bytes(b"latecomer" * 10)
    df = read_binary_assets(spark, str(root), modified_after=cutoff)
    got = [r["source_path"].split("/")[-1] for r in df.collect()]
    assert got == ["late.png"]
