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
from . import queries_r6  # noqa: E402,F401
from . import queries_r6b  # noqa: E402,F401
from . import queries_r6c  # noqa: E402,F401
from . import queries_r6d  # noqa: E402,F401
from . import queries_r6e  # noqa: E402,F401
from . import queries_r6f  # noqa: E402,F401
from . import queries_r6g  # noqa: E402,F401
from . import queries_r6h  # noqa: E402,F401
from . import queries_r6i  # noqa: E402,F401
from . import queries_r6j  # noqa: E402,F401
from . import queries_r6k  # noqa: E402,F401
from . import queries_r6l  # noqa: E402,F401
from . import queries_r6m  # noqa: E402,F401
from . import queries_r6n  # noqa: E402,F401
from . import queries_r6o  # noqa: E402,F401
from . import queries_r6p  # noqa: E402,F401
from . import queries_r6q  # noqa: E402,F401
from . import queries_r6r  # noqa: E402,F401
from . import queries_r6s  # noqa: E402,F401
from . import queries_r6t  # noqa: E402,F401
from . import queries_r6u  # noqa: E402,F401
from . import queries_r6v  # noqa: E402,F401
from . import queries_r6w  # noqa: E402,F401
from . import queries_r6x  # noqa: E402,F401
from . import queries_r6y  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). Rounds 3/4/5 rotated three distinct 50-query sets
# through the window (120 distinct driver-green queries, zero ever-red);
# round 6 ROTATES a FOURTH set in: the flagship (entry() canary) plus 49
# never-driver-sampled, ALL oracle-paired queries (the r5 window spent a
# slot on a rows-only op → `no_oracle`; this window buys 49 real
# hash-checked rows), including the round-5 verdict's named candidates,
# the repaired `evt_ltv_discounted` (d0-definition fix + dropped
# user-frame broadcast hint — its green row is the fix's driver-side
# proof), and the new `emb_ivfpq_residual_check` hash-checkable IVF-PQ
# twin. Everything certified in earlier rounds keeps its green row in
# those artifacts and stays covered by the order-independent full
# differential gate (scripts/diffcheck.py, tests/test_oracle.py), which
# runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # round-5 verdict candidates (repairs + r5 stragglers)
    "evt_ltv_discounted",
    "emb_ivfpq_residual_check",
    "emb_davies_bouldin",
    "doc_substring_search_trgm",
    "evt_geo_hotspot_grid",
    "evt_geo_radius_join",
    "evt_linear_interpolate",
    "evt_outlier_iqr",
    "sql_lateral_topk",
    "doc_temperature_mix",
    "evt_calibration_bins",
    "rel_weighted_median_price",
    "evt_gini_value",
    "evt_proportion_ztest",
    # relational / advanced SQL — never sampled before
    "rel_nation_trade_volume",
    "rel_profit_by_nation_year",
    "rel_top_supplier",
    "rel_late_sole_supplier",
    "rel_mom_revenue_growth",
    "rel_spend_percentiles",
    "rel_join_cardinality_audit",
    # event-series / time-series — never sampled before
    "evt_anomaly_zscore",
    "evt_gap_fill",
    "evt_ohlc_bars",
    "evt_ewma",
    "evt_holt_smoothing",
    "evt_seasonal_profile",
    "evt_welch_ttest",
    "evt_autocorrelation",
    "evt_attribution",
    "evt_psi_drift",
    # text corpus — never sampled before
    "doc_token_stats",
    "doc_langid_accuracy",
    "doc_simhash",
    "doc_fingerprints",
    "doc_corpus_filter",
    "doc_repetition_filter",
    "doc_pmi_collocations",
    "doc_vocab_coverage",
    "doc_novelty_fraction",
    # embeddings / ANN — never sampled before
    "emb_near_dup_cosine",
    "emb_label_centroids",
    "emb_kfold_assign",
    "emb_random_projection",
    # streaming (oracle-paired drain checks) — never sampled before
    "stream_sliding_counts",
    "stream_converted_views",
    "stream_dedup_ttl_counts",
    # multimodal — never sampled before
    "mm_payload_dedup",
    "mm_storage_report",
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
