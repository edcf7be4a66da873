"""Raw ingest CSV source (reference S1/S2).

The reference lists GCS blobs by prefix, picks the first ``.csv`` and
pandas-reads it headerless with 10 positional columns (`PUSH:116-124`,
`PUSH:205-207`). Spark-first: a glob path replaces manual listing, the
explicit all-string schema replaces inference (``na_filter=False``
equivalent: ``nullValue`` left at default, empty string stays empty via
``emptyValue``), and Catalyst prunes columns at the scan.

At 100 TB the same call scales: file listing is distributed, each file
becomes ≥1 input split, and there is no driver-side download step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_CSV_SCHEMA


def read_raw_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the headerless 10-column ingest CSV(s) at ``path`` (file, dir,
    or glob) with the fixed positional schema — never inferred."""
    return (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("header", "false")
        .option("quote", '"')
        .option("ignoreLeadingWhiteSpace", "true")
        .option("emptyValue", "")  # keep '' distinct from NULL (na_filter=False parity)
        .csv(path)
    )
