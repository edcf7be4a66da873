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
from pyspark.sql import functions as F


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


#: Driver-contract twin substitution (round-10 verdict task 4): demo
#: queries whose outputs are inherently engine-specific (k-means-fit
#: codebooks, float-cosine graphs, engine-native sketch binaries, numpy
#: linear solves) each have an oracle-paired TWIN that re-runs the
#: identical dataflow deterministically. For the DRIVER's differential
#: check, ``queries()``/``oracle_sql()`` substitute the twin under the
#: demo's name — BOTH sides, so the comparison is the twin against its
#: own oracle and a direct driver sample records a hash-matched row
#: instead of ``err: no_oracle`` (the only non-green driver cell ever
#: recorded, r05). The demo's real implementation stays in REGISTRY
#: under its own name for bench timing, the compat smoke, and its exact
#: pytest gates — this mapping only affects the driver-contract view.
#: Round 12 (r11 ADVICE): the substitution is driver-VISIBLE — both
#: sides emit a constant ``substituted_by = '<twin>'`` column (see
#: ``_marked_twin``), so no coverage reading of the driver artifacts
#: can mistake a twin's green row for a hash check of the demo itself.
DRIVER_TWINS: dict[str, str] = {
    "evt_sketch_profile": "evt_sketch_portable_profile",
    "evt_series_dtw": "evt_dtw_check",
    "emb_pq_topk": "emb_pq_adc_check",
    "emb_ivfpq_topk": "emb_ivfpq_residual_check",
    "emb_ivfpq_residual_topk": "emb_ivfpq_residual_check",
    "emb_lloyd_kmeans": "emb_lloyd_round2_check",
    "doc_bpe_train_merges": "doc_bpe_train3_check",
    "emb_mmr_rerank": "emb_mmr_check",
    "evt_cms_heavy_hitters": "evt_cms_portable_check",
    "evt_hll_rollup_distinct": "evt_hll_portable_rollup",
    "mm_phash_near_dup": "mm_phash_portable_check",
    "emb_pca_project": "emb_pca_basis_check",
    "evt_markov_attribution": "evt_markov_absorption_check",
    "emb_knn_communities": "emb_knn_label_prop_check",
    "evt_hll_audience_overlap": "evt_hll_portable_overlap",
    "emb_logreg_eval": "emb_logreg_margin_check",
    "doc_bloom_decontaminate": "doc_bloom_portable_check",
    "evt_cusum_alarms": "evt_cusum_check",
    "evt_approx_percentiles": "evt_histogram_quantile_check",
}


def _driver_spec(name: str) -> QuerySpec:
    """The spec the DRIVER contract should run under ``name``."""
    spec = REGISTRY[name]
    twin = DRIVER_TWINS.get(name)
    if twin is None or spec.oracle is not None:
        return spec
    twin_spec = REGISTRY[twin]
    if twin_spec.oracle is None:  # twin lost its oracle: fail loud
        raise ValueError(
            f"driver twin {twin!r} of {name!r} has no oracle"
        )
    return _marked_twin(twin_spec)


def _marked_twin(twin_spec: QuerySpec) -> QuerySpec:
    """The twin spec with the substitution made DRIVER-VISIBLE (round-11
    ADVICE): both the Spark result and the oracle result carry a
    constant ``substituted_by = '<twin name>'`` column, so every driver
    artifact row produced under a demo's name records — in its own
    schema — that the hash certifies the TWIN's dataflow, not the
    nondeterministic demo itself. The marker is identical on both
    sides, so it never perturbs the value hash; wrapping the oracle in
    a subquery is safe because the driver compare is order-insensitive
    (it sorts rows and columns before hashing)."""
    twin = twin_spec.name

    def marked_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return twin_spec.spark_fn(spark, sf_dir).withColumn(
            "substituted_by", F.lit(twin)
        )

    marked_fn.__name__ = f"{twin}_driver_marked"
    marked_fn.substituted_by = twin
    marked_oracle = (
        f"SELECT q.*, '{twin}' AS substituted_by\nFROM (\n{twin_spec.oracle}\n) q"
    )
    return QuerySpec(
        twin,
        marked_fn,
        marked_oracle,
        twin_spec.description,
        twin_spec.tags,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _driver_spec(name).spark_fn for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name in REGISTRY:
        oracle = _driver_spec(name).oracle
        if oracle is not None:
            out[name] = oracle
    return out
