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
from . import queries_r10a  # noqa: E402,F401
from . import queries_r10b  # noqa: E402,F401
from . import queries_r10c  # noqa: E402,F401
from . import queries_r10d  # noqa: E402,F401
from . import queries_r10e  # noqa: E402,F401
from . import queries_r10f  # noqa: E402,F401
from . import queries_r10g  # noqa: E402,F401
from . import queries_r10h  # noqa: E402,F401
from . import queries_r10i  # noqa: E402,F401
from . import queries_r10j  # noqa: E402,F401
from . import queries_r10l  # noqa: E402,F401
from . import queries_r10m  # noqa: E402,F401
from . import queries_r10n  # noqa: E402,F401
from . import queries_r11a  # noqa: E402,F401
from . import queries_r11b  # noqa: E402,F401
from . import queries_r11c  # noqa: E402,F401
from . import queries_r11d  # noqa: E402,F401
from . import queries_r11e  # noqa: E402,F401
from . import queries_r11f  # noqa: E402,F401
from . import queries_r11g  # noqa: E402,F401
from . import queries_r11h  # noqa: E402,F401
from . import queries_r11i  # noqa: E402,F401
from . import queries_r11j  # noqa: E402,F401
from . import queries_r11k  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). NEXT ROTATION: run `python scripts/rotation_candidates.py`
# — it unions all committed CORRECTNESS_r*.json and lists the
# never-driver-sampled oracle-paired queries per module; replace the
# tuple below with the flagship + 49 of those.
# Rounds 3–9 rotated seven distinct 50-query sets through the window
# (312 distinct driver-sampled queries; zero §2 query ever red — the
# only two ever-red rows, round-8's evt_gains_table/evt_levene_median,
# were oracle-environment parity breaks, re-certified green in round 9).
# Round 11 ROTATES the NINTH set in: 49 never-sampled queries leading
# with every remaining r10 batch entry (the newest additions get driver
# history while fresh — including ALL THREE transformWithStateInPandas
# oracle queries, round-10 verdict task 5) and the ext-module stragglers,
# then the 21 remaining r9 singletons. Everything certified in earlier
# rounds keeps its green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # ext stragglers
    "doc_unk_mask",
    "emb_dedup_clusters",
    "stream_corpus_filter",
    "stream_series_state",
    # r10a — TWS ValueState
    "stream_series_state_tws",
    # r10b
    "evt_diebold_mariano",
    "evt_pinball_loss",
    "evt_variance_ratio_test",
    # r10c
    "doc_gopher_rules",
    "emb_hubness",
    # r10d — TWS ListState
    "stream_interval_union_tws",
    # r10e
    "evt_sample_entropy",
    "rel_nation_portfolio_overlap",
    # r10f
    "evt_bgnbd_summary",
    "evt_conformal_prediction",
    # r10g — TWS MapState
    "stream_user_type_histogram_tws",
    # r10h
    "emb_trustworthiness",
    "evt_l_moments",
    # r10i
    "doc_ndcg_at_k",
    "evt_hoover_index",
    # r10j
    "evt_purged_cv_folds",
    "rel_leadtime_reliability",
    # r10l
    "evt_digit_heaping",
    "rel_assortment_churn",
    # r10m
    "emb_knn_margin",
    "emb_reciprocal_nn",
    # r10n
    "doc_dup_cluster_sources",
    "evt_tv_drift",
    # r9 singletons (the last never-sampled r9 entries)
    "evt_peaks_over_threshold",
    "emb_cluster_label_purity",
    "evt_weibull_plot_fit",
    "evt_mutual_information",
    "evt_simpson_paradox_audit",
    "evt_ldp_frequency",
    "evt_session_gap_sweep",
    "rel_intermittency_profile",
    "evt_tail_dependence",
    "evt_moment_skew_kurtosis",
    "evt_turning_points",
    "evt_chow_test",
    "evt_kpss_partial_sums",
    "rel_soundex_blocking",
    "evt_xbar_r_chart",
    "evt_transfer_entropy",
    "stream_histogram_quantiles",
    "evt_kupiec_var_backtest",
    "rel_auction_clearing",
    "evt_lof_reachability",
    # r11e — TWS event-time timers (the 4th typed-state leg, new this
    # round: certify it while fresh; evt_nelson_rules rotates in r12)
    "stream_session_close_tws",
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
