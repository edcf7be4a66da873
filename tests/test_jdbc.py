"""JDBC source/sink round-trip (reference S3/S7 external-DB parity,
VERDICT r1 #7) against embedded Derby — the JDBC engine bundled with
Spark's jars, so no external service is needed. Production swaps the
URL/driver for MySQL/Postgres; the API surface is identical.

Derby quirk worth encoding: Spark writes columns as quoted (case-exact)
identifiers, so queries against Derby must quote them too — unquoted
names fold to uppercase.
"""

from __future__ import annotations

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.jdbc import (
    DERBY_DRIVER,
    read_jdbc,
    write_jdbc,
)


def test_jdbc_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(100).withColumnRenamed("id", "k")

    # S7: batched append sink (executemany-chunk parity via batchsize)
    write_jdbc(df, url, "t1", mode="overwrite", driver=DERBY_DRIVER, batchsize=50)
    back = read_jdbc(spark, url, table="t1", driver=DERBY_DRIVER)
    assert back.count() == 100
    assert [f.name for f in back.schema.fields] == ["k"]

    # append on top of existing rows
    write_jdbc(df.limit(10), url, "t1", mode="append", driver=DERBY_DRIVER)
    assert read_jdbc(spark, url, table="t1", driver=DERBY_DRIVER).count() == 110

    # S3: arbitrary SQL pushed down whole to the database
    q = read_jdbc(
        spark,
        url,
        query='SELECT "k" FROM t1 WHERE "k" < 10',
        driver=DERBY_DRIVER,
    )
    assert q.count() == 20  # 10 originals + 10 appended

    # partitioned range read: one bounded query per partition — the
    # parallel-extract form any large table must use
    p = read_jdbc(
        spark,
        url,
        table="t1",
        driver=DERBY_DRIVER,
        partition_column='"k"',
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert p.rdd.getNumPartitions() == 4
    assert p.count() == 110


def test_jdbc_arg_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:derby:memory:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:derby:memory:x")
