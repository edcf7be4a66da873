"""ORC source/sink: the second columnar format big-data estates
actually hold (Hive-era tables are overwhelmingly ORC).  Spark's ORC
reader is built in and supports the same predicate pushdown + column
pruning as parquet, so the loader is thin: the value of this module is
the TYPE-FIDELITY contract (`orc_roundtrip_check`) — a table written to
ORC and read back must be value-identical, which is NOT automatic
(timestamp representations and decimal widths differ between formats).

Reference parity: extends the S-family scan surface (SURVEY §2.1) the
same way `jsonl`/`csv_source` do — same schema-on-read posture, same
pushdown expectations, different container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC write; partition-atomic like every file sink here."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read ORC scan — Catalyst pushes filters and prunes
    columns into the ORC reader exactly as with parquet (asserted by
    ``test_orc_pushdown``)."""
    return spark.read.orc(path)


def orc_roundtrip_check(spark: SparkSession, df: DataFrame, path: str) -> bool:
    """Write ``df`` to ORC, read it back, and compare (a) the schema
    field-for-field and (b) a deterministic whole-table digest (xxhash64
    of every column, summed) — the cheap distributed way to assert value
    fidelity without collecting either side.

    The schema comparison is load-bearing: the string-cast digest alone
    is blind to exactly the drift this module warns about (a widened
    decimal or a timestamp-type change casts to the same string)."""
    from pyspark.sql import functions as F

    write_orc(df, path)
    back = read_orc(spark, path)

    if [(f.name, f.dataType) for f in df.schema.fields] != [
        (f.name, f.dataType) for f in back.schema.fields
    ]:
        return False

    def digest(d: DataFrame):
        cols = sorted(d.columns)
        return (
            d.select(
                F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias(
                    "h"
                )
            )
            .agg(F.sum(F.col("h").cast("decimal(38,0)")))
            .first()[0]
        )

    return digest(df) == digest(back) and df.count() == back.count()
