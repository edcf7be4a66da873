"""Raw binary-asset ingestion via Spark's ``binaryFile`` source — the
on-disk front door for the multimodal operators.

``operators/multimodal.py`` processes (asset_id, media_type, payload)
frames; in production those payloads start life as FILES (images,
audio, video) in an object store.  ``binaryFile`` reads them with
zero Python involvement — each row carries (path, modificationTime,
length, content) straight from the DataSource V2 reader — and this
module maps that to the multimodal schema:

- ``asset_id``: xxhash64 of the path (stable, collision-checked by the
  test at fixture scale; real deployments usually carry a manifest id).
- ``media_type``: from the file extension (literal map).
- ``payload``: the raw bytes.

Scale notes: ``binaryFile`` parallelizes across files (one row per
file; Spark's maxPartitionBytes packing applies), payload bytes live
in executor memory only for the partitions being processed, and the
``modifiedAfter`` option turns re-ingestion into an incremental
pick-up without a manifest (for exactly-once semantics layer the txn
table's ``append_exactly_once`` on top).  ``pathGlobFilter`` prunes
by extension BEFORE reading bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type (lowercase, no dot).
_EXT_MAP = {
    "png": "image",
    "jpg": "image",
    "jpeg": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
}


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modified_after: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of raw asset files into the multimodal frame
    (asset_id, media_type, payload, n_bytes, source_path, modified).

    ``modified_after`` (ISO timestamp string) makes the read
    incremental — only files touched after the watermark are returned,
    which is the poor-man's CDC for asset drops.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = F.coalesce(
        *[
            F.when(ext == e, F.lit(m))
            for e, m in _EXT_MAP.items()
        ],
        F.lit("binary"),
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("asset_id"),
        media_type.alias("media_type"),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
        F.col("path").alias("source_path"),
        F.col("modificationTime").alias("modified"),
    )
