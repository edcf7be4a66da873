"""Named query registry: each entry pairs a PySpark DataFrame program
with its ANSI-SQL DuckDB oracle (the driver's differential-correctness
contract)."""

from .registry import REGISTRY, QuerySpec, oracle_sql, queries

# importing the query modules populates REGISTRY
from . import queries_core  # noqa: E402,F401
from . import queries_ext  # noqa: E402,F401
from . import queries_r3  # noqa: E402,F401
from . import queries_r4  # noqa: E402,F401
from . import queries_r4b  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order), so the head of the registry must hold one flagship
# per operator family — core relational, event pipeline, parser
# functions, upsert/merge, split, metrics, streaming, dedup
# (exact/MinHash-LSH/SimHash/CC), ANN (cosine/LSH/IVF), text corpus
# (quality/BM25/tf-idf/decontaminate), multimodal, and advanced SQL
# (grouping sets / pivot / SCD2), plus the round-4 statistics/
# substring-dedup/constraint-audit flagships.  Everything else keeps its original
# relative order after the priority block.  The full 200-query
# differential gate (scripts/diffcheck.py, tests/test_oracle.py) is
# order-independent and still covers every entry.
_PRIORITY: tuple[str, ...] = (
    # flagship + event-pipeline core (reference parity: S/P/J/A/W/F items)
    "evt_metrics_r2_mse",
    "evt_typed_scan",
    "evt_hwm_filter",
    "evt_upsert_dedup",
    "evt_upsert_merge_partitioned",
    "evt_lag_features",
    "evt_ffill_bfill",
    "evt_chrono_split",
    "evt_minmax_normalize",
    "evt_group_mean_impute",
    "evt_latest_per_group",
    "evt_routed_inference",
    "evt_sequence_build",
    "evt_sessionize",
    "evt_monthly_rollup",
    # parser functions
    "fn_parse_date_roundtrip",
    "fn_parse_time_roundtrip",
    "fn_parse_numeric_suffixes",
    "fn_clean_text_sentinel",
    # relational / advanced SQL
    "rel_pricing_summary",
    "rel_topk_orders_per_segment",
    "rel_rollup_revenue",
    "sql_grouping_sets_revenue",
    "rel_pivot_status",
    "rel_scd2_priority_dim",
    "sql_top_customers_per_segment",
    # time-series / joins / skew
    "evt_asof_join",
    "evt_interval_join",
    "evt_salted_heavy_hitters",
    "evt_rolling_window_stats",
    "evt_series_mad_fast",
    # dedup family
    "doc_exact_dedup",
    "doc_minhash_lsh_candidates",
    "doc_dedup_clusters",
    "doc_dedup_pipeline",
    "doc_repeated_spans",
    # statistics / evaluation family (round-4 session 2)
    "evt_ks_drift",
    "evt_ols_features",
    "rel_referential_audit",
    # ANN / embeddings family
    "emb_cosine_topk",
    "emb_bucketed_ann_topk",
    # journey-analytics family (round-4 session 3; IVF stays covered by
    # the full diffcheck + emb_bucketed_ann_topk's driver row)
    "evt_windowed_funnel",
    # text corpus family
    "doc_quality_profile",
    "doc_bm25_search",
    "doc_decontaminate",
    # streaming family
    "stream_dedup_counts",
    "stream_windowed_counts",
    "stream_incremental_rollup",
    # multimodal family
    "mm_media_meta",
    "mm_audio_chunks",
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
