"""External JDBC source/sink (reference S3/S7 external-database parity).

The reference reads arbitrary SQL into pandas over a mysql-connector
session (``query_to_df``, DB:110-117) and appends with chunked
``executemany`` batches of 500/1000 rows (``df_to_table``, DB:120-150).
Spark-first equivalents:

- read: ``spark.read.jdbc`` — the *query* form pushes the whole SQL to
  the database (the reference's arbitrary-SELECT entry point); the
  *table* form with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` issues one range-predicated query per partition, so a
  100 TB-adjacent dimension extract reads in parallel instead of
  through one connection (the reference is single-connection by
  construction).
- write: ``df.write.jdbc`` with ``batchsize`` — each executor writes
  its partitions over its own connection in JDBC batches, the exact
  executemany-chunk semantics, but N connections wide instead of 1.

Tests run against embedded Derby (the JDBC engine bundled with Spark);
production swaps the URL/driver for MySQL/Postgres — the API surface
is identical, which is the point of the seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby (bundled with Spark's jars) — used by the round-trip
#: test; real deployments pass a mysql/postgres URL + driver instead.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S3 parity: load a table or an arbitrary pushed-down SQL query.

    Exactly one of ``table`` / ``query``. With ``partition_column`` (+
    bounds + ``num_partitions``), the scan is split into range-bounded
    parallel reads — required for any large extract; the single-query
    form is for small/dimension pulls only.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    r = spark.read.format("jdbc").option("url", url)
    if driver:
        r = r.option("driver", driver)
    if query is not None:
        r = r.option("query", query)
    else:
        r = r.option("dbtable", table)
        if partition_column is not None:
            r = (
                r.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
                .option("numPartitions", str(num_partitions or 4))
            )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    driver: str | None = None,
    **options: str,
) -> None:
    """S7 parity: batched INSERT sink. ``batchsize`` is the reference's
    executemany chunk size (DB:120-150, default 1000); each executor
    batches its own partitions over its own connection."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
