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
from . import queries_r5  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). Rounds 3/4 used the window to certify the §2 core
# and the first 24 extension families; round 5 ROTATES a third distinct
# set in: the flagship (entry() canary), the six round-4 TIMESTAMP_NTZ
# casualties (now fixed in load_table — their green rows ARE the fix's
# driver-side proof), and 43 never-driver-sampled family flagships
# spanning relational/advanced-SQL, time-series, text-corpus, dedup,
# ANN/embeddings, streaming, and multimodal. Everything certified in
# r3/r4 keeps its green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # round-4 NTZ casualties: must be driver-green this round
    "evt_sessionize",
    "evt_interval_join",
    "evt_rolling_window_stats",
    "evt_max_concurrency",
    "evt_asof_nearest",
    "evt_time_to_convert",
    # relational / advanced SQL — never sampled before
    "rel_min_cost_supplier",
    "rel_market_share",
    "rel_cube_revenue",
    "rel_unpivot_returnflag_measures",
    "rel_cohort_retention",
    "rel_rfm_scores",
    "rel_pareto_revenue",
    "rel_segment_migration",
    "rel_supplier_hhi",
    "rel_discount_elasticity",
    "rel_scd2_point_in_time",
    "sql_recursive_month_spine",
    # event-series / journeys — never sampled before
    "evt_stl_decompose",
    "evt_markov_transitions",
    "evt_funnel",
    "evt_km_retention",
    # text corpus — never sampled before (incl. the r5 UDTF fast twin
    # and the r5 re-bounded levenshtein verify)
    "doc_containment",
    "doc_top_terms_fast",
    "doc_top_terms_udtf",
    "doc_levenshtein_verify",
    "doc_phrase_search",
    "doc_tfidf_top_terms",
    "doc_minhash_estimate_error",
    "doc_cluster_topics",
    "doc_source_js_divergence",
    "doc_pagerank_authority",
    "doc_kn_bigram_lm",
    "doc_pii_scrub",
    # embeddings / ANN — never sampled before
    "emb_ivf_topk",
    "emb_ivfpq_residual_topk",
    "emb_kmeans_assign",
    "emb_semantic_dedup",
    "emb_knn_eval",
    "emb_fisher_ratio",
    "emb_silhouette",
    # streaming — never sampled before
    "stream_session_windows",
    "stream_view_purchase_join",
    "stream_static_enrich",
    "stream_pydatasource_counts",
    # multimodal — never sampled before
    "mm_scene_cuts",
    "mm_frame_sample",
    "mm_media_features",
    "src_pydatasource_agg",
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
