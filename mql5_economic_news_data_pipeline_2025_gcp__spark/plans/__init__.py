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

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). NEXT ROTATION: run `python scripts/rotation_candidates.py`
# — it unions all committed CORRECTNESS_r*.json and lists the
# never-driver-sampled oracle-paired queries per module; replace the
# tuple below with the flagship + 49 of those (largest never-sampled
# pools first: the r6b suite alone holds 41).
# Rounds 3/4/5/6/7 rotated five distinct 50-query sets
# through the window (217 distinct driver-green queries, zero ever-red);
# round 8 ROTATES the SIXTH set in: the flagship (entry() canary) plus 49
# never-driver-sampled, ALL oracle-paired queries — exactly the families
# the round-7 verdict named: the r6c–r6v allocation/segmentation/queueing
# singles never sampled in any window, the four r7a literal-artifact
# twins (incl. the round-8-trimmed doc_bloom_portable_check), and the
# complete r7b–r7l statistics/corpus/ops batches (incl. the round-8
# epoch-guarded evt_haar_energy). Everything certified in earlier rounds
# keeps its green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # r6c–r6v suites: never sampled in any of the five prior windows
    "evt_changepoint_sse",
    "evt_interval_coverage",
    "evt_queue_wait_lindley",
    "evt_logrank_table",
    "evt_gains_table",
    "evt_standardized_rates",
    "evt_sax_words",
    "mm_modality_mix_plan",
    "evt_chisq_independence",
    # r7a literal-artifact twins
    "doc_bloom_portable_check",
    "emb_lloyd_round2_check",
    "emb_logreg_margin_check",
    "emb_pca_basis_check",
    # r7b hypothesis tests
    "evt_mann_whitney_u",
    "evt_durbin_watson",
    "evt_grubbs_outlier",
    "evt_levene_median",
    "evt_cochran_q",
    # r7c corpus statistics
    "doc_hapax_ratio",
    "doc_heaps_law",
    "doc_simpson_diversity",
    "doc_ttr_chunks",
    # r7d relational / growth
    "evt_dau_mau",
    "rel_inventory_policy",
    "rel_knapsack_greedy",
    "rel_wilson_ranking",
    # r7e streaming + embedding profiles
    "emb_sq_error_profile",
    "stream_session_values",
    # r7f graph / change detection
    "doc_boilerplate_prefixes",
    "doc_dupgraph_kcore",
    "evt_cusum_squares",
    "evt_rescaled_range",
    # r7g experimentation
    "evt_conversion_window_sweep",
    "evt_frequency_cap_sim",
    "evt_power_analysis",
    "evt_srm_check",
    # r7h point-process / SQL surface
    "evt_fano_factor",
    "evt_records_test",
    "sql_pivot_monthly_status",
    # r7i supply chain
    "evt_interarrival_cv",
    "rel_bullwhip_ratio",
    "rel_otif_fill",
    # r7j sampling / graph
    "doc_dupgraph_assortativity",
    "doc_priority_sample",
    "rel_repurchase_intervals",
    # r7k wavelets / fingerprints (evt_haar_energy carries the r8 epoch guard)
    "doc_simhash_distance_profile",
    "evt_haar_energy",
    # r7l token shapes / calendar lift
    "doc_token_shape_profile",
    "evt_weekday_weekend_lift",
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
