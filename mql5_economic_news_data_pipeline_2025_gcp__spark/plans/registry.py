"""Query registry infrastructure.

Every query is a ``(spark_fn, oracle_sql)`` pair:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the PySpark program.
- ``oracle``   — equivalent ANSI SQL for DuckDB over the same parquet
  (views pre-registered by the driver), or ``None`` for ops that aren't
  SQL-expressible (streaming, nondeterministic models) → rows-only check.

Determinism contract (how hash-equality across two engines is achieved):

1. **Integer-exact arithmetic.** Money/value doubles in the test tables
   are 2-decimal; ``CAST(round(x*100) AS BIGINT)`` ("cents") is exact in
   both engines, integer sums/counts are exact, and any final division
   is written with the IDENTICAL expression tree on both sides so both
   engines execute the same IEEE-754 ops → bit-equal doubles.
2. **No raw double aggregation.** ``sum(double)`` is order-dependent;
   never emitted. Averages are ``exact_int_sum / count`` divisions.
3. **Deterministic ordering.** Window ranks always carry a unique
   tie-breaker column.
4. **Engine-portable digests.** md5 (hex string) exists identically in
   both engines; all hashing (dedup, minhash, fingerprints) uses it.

``_prepare`` makes any externally-supplied SparkSession (the driver's)
safe: UTC session TZ and nanos-as-long parquet reading (see
sources.tables).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # a duplicate name would SILENTLY shadow the earlier query (dict
        # insertion order also feeds the driver's sampling window) — a
        # round-7 batch once shadowed stream_session_windows this way
        # and only a registry-count mismatch caught it
        if name in REGISTRY:
            raise ValueError(f"duplicate registry query name: {name!r}")
        wrapped = _with_prepare(fn)
        REGISTRY[name] = QuerySpec(name, wrapped, oracle, description, tags)
        return wrapped

    return deco


def _with_prepare(fn: Callable) -> Callable:
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        prepare_session(spark)
        return fn(spark, sf_dir)

    inner.__name__ = getattr(fn, "__name__", "query")
    inner.__doc__ = fn.__doc__
    return inner


def prepare_session(spark: SparkSession) -> None:
    """Make an arbitrary session comparable with the DuckDB oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # PySpark 4.1 stock default is true → naive timestamp[us] parquet
    # would arrive TIMESTAMP_NTZ and break unix_micros (round-4 driver
    # break); load_table forces this too, but any query that re-reads
    # its own written files gets the same guarantee from here.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
