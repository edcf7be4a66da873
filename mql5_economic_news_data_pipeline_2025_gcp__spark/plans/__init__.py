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
from . import queries_r7a  # noqa: E402,F401
from . import queries_r7b  # noqa: E402,F401
from . import queries_r7c  # noqa: E402,F401
from . import queries_r7d  # noqa: E402,F401
from . import queries_r7e  # noqa: E402,F401
from . import queries_r7f  # noqa: E402,F401
from . import queries_r7g  # noqa: E402,F401
from . import queries_r7h  # noqa: E402,F401
from . import queries_r7i  # noqa: E402,F401
from . import queries_r7j  # noqa: E402,F401
from . import queries_r7k  # noqa: E402,F401
from . import queries_r7l  # noqa: E402,F401
from . import queries_r8a  # noqa: E402,F401
from . import queries_r8b  # noqa: E402,F401
from . import queries_r8c  # noqa: E402,F401
from . import queries_r8d  # noqa: E402,F401
from . import queries_r8e  # noqa: E402,F401
from . import queries_r8f  # noqa: E402,F401
from . import queries_r8g  # noqa: E402,F401
from . import queries_r8h  # noqa: E402,F401
from . import queries_r8i  # noqa: E402,F401
from . import queries_r9a  # noqa: E402,F401
from . import queries_r9b  # noqa: E402,F401
from . import queries_r9c  # noqa: E402,F401
from . import queries_r9d  # noqa: E402,F401
from . import queries_r9e  # noqa: E402,F401
from . import queries_r9f  # noqa: E402,F401
from . import queries_r9g  # noqa: E402,F401
from . import queries_r9h  # noqa: E402,F401
from . import queries_r9i  # noqa: E402,F401
from . import queries_r9j  # noqa: E402,F401
from . import queries_r9k  # noqa: E402,F401
from . import queries_r9l  # noqa: E402,F401
from . import queries_r9m  # noqa: E402,F401
from . import queries_r9n  # noqa: E402,F401
from . import queries_r9o  # noqa: E402,F401
from . import queries_r9p  # noqa: E402,F401
from . import queries_r9q  # noqa: E402,F401
from . import queries_r9r  # noqa: E402,F401
from . import queries_r9s  # noqa: E402,F401
from . import queries_r9t  # noqa: E402,F401
from . import queries_r9u  # noqa: E402,F401
from . import queries_r9v  # noqa: E402,F401
from . import queries_r9w  # noqa: E402,F401
from . import queries_r9x  # noqa: E402,F401
from . import queries_r9y  # noqa: E402,F401
from . import queries_r9z  # noqa: E402,F401
from . import queries_r9aa  # noqa: E402,F401
from . import queries_r9ab  # noqa: E402,F401
from . import queries_r9ac  # noqa: E402,F401
from . import queries_r9ad  # noqa: E402,F401
from . import queries_r9ae  # noqa: E402,F401
from . import queries_r9af  # noqa: E402,F401
from . import queries_r9ag  # noqa: E402,F401
from . import queries_r9ah  # noqa: E402,F401
from . import queries_r9ai  # noqa: E402,F401
from . import queries_r9aj  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). NEXT ROTATION: run `python scripts/rotation_candidates.py`
# — it unions all committed CORRECTNESS_r*.json and lists the
# never-driver-sampled oracle-paired queries per module; replace the
# tuple below with the flagship + 49 of those (largest never-sampled
# pool: the r6b suite holds 41).
# Rounds 3–8 rotated six distinct 50-query sets through the window (267
# distinct driver-sampled queries; the ONLY two ever-red rows —
# evt_gains_table / evt_levene_median in round 8 — were
# oracle-environment parity breaks, not value bugs). Round 9 ROTATES the
# SEVENTH set in, leading with every query whose shape changed in the
# round-9 parity hardening (the two round-8 reds rebuilt on pinned
# integer decile arithmetic / BIGINT-half outputs, plus the seven
# queries scripts/parity_lint.py flagged for the same HUGEINT /
# ntile-convention hazards), then the complete never-sampled r8a–r8i
# batches the round-8 verdict named, then the oldest never-sampled
# core/ext singles. Everything certified in earlier rounds keeps its
# green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # round-8 driver reds, rebuilt this round — re-certification is the
    # round-9 gate ("done" = hash-green in THIS window)
    "evt_gains_table",
    "evt_levene_median",
    # parity-lint hazards hardened this round (hash changed locally)
    "evt_value_deciles",
    "evt_tree_scoring_sql",
    "rel_rfm_scores",
    "doc_ppl_buckets",
    "evt_ltv_discounted",
    "doc_bpe_train3_check",
    "emb_semihard_triplets",
    # r8a literal-artifact twins
    "emb_knn_label_prop_check",
    "emb_pq_adc_check",
    "evt_hll_portable_overlap",
    "evt_sketch_portable_profile",
    "mm_phash_portable_check",
    # r8b tokenizer economics / calibration
    "doc_ngram_coverage_curve",
    "doc_vocab_pruning_oov",
    "doc_wordpiece_fertility",
    "evt_brier_decomposition",
    "evt_ipf_raking_check",
    # r8c rate limiting (batch replays + the stateful drain)
    "evt_rate_limit_audit",
    "evt_rate_limit_policy_sweep",
    "stream_rate_limited",
    # r8d distributional / ANN / autocorrelation
    "emb_binary_quantization_topk",
    "evt_pacf_yw",
    "evt_wasserstein_1d",
    # r8e streaming HLL / graph / cointegration
    "doc_dupgraph_modularity",
    "evt_cointegration_lite",
    "stream_hll_portable_distinct",
    # r8f–r8i singles
    "doc_span_corruption",
    "evt_qini_uplift",
    "evt_changepoint_binseg2",
    "evt_mase_backtest",
    # oldest never-sampled core singles
    "emb_class_downsample",
    "evt_data_quality_audit",
    "evt_hash_sample",
    "evt_incremental_monthly_agg",
    "evt_series_similarity_topk",
    "evt_spearman_view_purchase",
    "rel_brand_disjunctive_revenue",
    "rel_returned_revenue_topk",
    "rel_ship_speed_priority",
    "sql_monthly_priority_share",
    # oldest never-sampled ext singles
    "doc_bpe_token_counts",
    "doc_chunk_windows",
    "doc_dedup_keep_best",
    "doc_dupgraph_triangles",
    "doc_jaccard_near_dup",
    "doc_mix_sample",
    "doc_train_shuffle",
)


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_PRIORITY names missing from REGISTRY (typo in rotation?): {missing}"
        )
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
