"""JSONL (newline-delimited JSON) source — the raw-crawl interchange
format every LLM data pipeline ingests (Common Crawl derivatives,
API dumps, labeling exports arrive as ``*.jsonl`` / ``*.jsonl.gz``).

Spark-first rules encoded here:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a FULL extra pass over the data to infer types — at
  100 TB that doubles ingest cost and the inferred types drift with
  the sample. The schema is a declared contract.
- **Corrupt-record policy is explicit.** PERMISSIVE + a named
  ``_corrupt_record`` column quarantines bad lines instead of killing
  the job (a crawl batch always has some); ``badRecordsPath``-style
  triage happens by filtering that column to a reject sink. DROPMALFORMED
  silently loses data and FAILFAST kills a 10-hour ingest on line one —
  both are opt-in only.
- **Compressed splits.** gzip is NOT splittable — one ``.jsonl.gz``
  becomes one task however big it is. The loader accepts whatever is
  there, but ingest jobs should land zstd/bzip2 or many medium gz
  shards; this is a data-layout contract, documented at the seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Declared contract for document-shaped JSONL (the documents-table
#: schema plus the quarantine column).
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """Read JSONL at ``path`` (file, dir, or glob) with the declared
    schema; malformed lines land whole in ``_corrupt_record`` with
    every data column null."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects): rows whose ``_corrupt_record`` is null parse
    fully and drop the quarantine column; the rest keep only the raw
    line for triage.

    The parsed frame is persisted first: Spark refuses plans that read
    ONLY the internal corrupt-record column from a raw scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both halves reuse one parse
    instead of re-reading the files — in an ingest job this frame feeds
    the clean sink and the reject sink in the same action anyway."""
    df = df.persist()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    rejects = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, rejects


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a frame as JSONL (one object per line) — the export half of
    the interchange seam. ``compression='gzip'|'zstd'|...`` optional;
    prefer splittable codecs for anything a downstream Spark job reads."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
