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

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). NEXT ROTATION: run `python scripts/rotation_candidates.py`
# — it unions all committed CORRECTNESS_r*.json and lists the
# never-driver-sampled oracle-paired queries per module; replace the
# tuple below with the flagship + 49 of those.
# Rounds 3–9 rotated seven distinct 50-query sets through the window
# (312 distinct driver-sampled queries; zero §2 query ever red — the
# only two ever-red rows, round-8's evt_gains_table/evt_levene_median,
# were oracle-environment parity breaks, re-certified green in round 9).
# Round 10 ROTATES the EIGHTH set in: 49 never-sampled round-9 queries
# spanning all 36 r9 batches, leading with the newest (r9a, r9aa–r9aj)
# and force-including the three advisor-flagged queries fixed this
# round (evt_sprt_conversion first-crossing decision,
# doc_word_bigram_entropy 1-token guard, rel_duplicate_payments
# disjoint injection keys) plus the verdict-named samples
# (stream_page_hinkley, rel_fifo_cogs, emb_kcenter_coreset, …).
# Everything certified in earlier rounds keeps its green row in those
# artifacts and stays covered by the order-independent full
# differential gate (scripts/diffcheck.py, tests/test_oracle.py),
# which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # r9a
    "evt_atkinson_stats",
    "evt_theil_inequality",
    "rel_herfindahl_market",
    # r9aa
    "evt_lorenz_asymmetry",
    "evt_rayleigh_hours",
    # r9ab
    "evt_robust_shape_quantiles",
    "rel_mrp_projection",
    # r9ac
    "evt_walsh_hadamard_energy",
    # r9ad
    "evt_partial_correlation",
    "evt_pettitt_test",
    # r9ae
    "evt_benford_two_digit",
    "evt_sprt_conversion",
    # r9af
    "doc_shard_token_balance",
    "evt_pairwise_wins_bt",
    # r9ag
    "doc_greedy_vocab_cover",
    "evt_dominant_period",
    # r9ah
    "evt_decile_shift_function",
    # r9ai
    "doc_word_bigram_entropy",
    "evt_time_to_threshold",
    # r9aj
    "rel_price_dispersion",
    # r9y
    "rel_duplicate_payments",
    # r9c
    "stream_page_hinkley",
    # r9p
    "rel_fifo_cogs",
    # r9b
    "doc_blocklist_filter",
    # r9c
    "evt_page_hinkley",
    # r9d
    "emb_anisotropy_spectrum",
    # r9e
    "evt_confusion_threshold",
    # r9f
    "emb_distance_histogram",
    # r9g
    "rel_croston_intermittent",
    # r9h
    "evt_information_value",
    # r9i
    "evt_hill_tail_index",
    # r9j
    "evt_permutation_entropy",
    # r9k
    "evt_burst_hysteresis",
    # r9l
    "evt_adstock_carryover",
    # r9m
    "emb_hnsw_level_plan",
    # r9n
    "stream_cms_portable_grid",
    # r9o
    "emb_kcenter_coreset",
    # r9p
    "evt_energy_distance",
    # r9q
    "evt_higuchi_fd",
    # r9r
    "evt_seasonal_mann_kendall",
    # r9s
    "emb_alignment_uniformity",
    # r9t
    "evt_downside_risk",
    # r9u
    "evt_empirical_copula",
    # r9v
    "doc_watermark_greenlist",
    # r9w
    "emb_twonn_intrinsic_dim",
    # r9x
    "doc_rbo_term_ranks",
    # r9y
    "evt_hampel_filter",
    # r9z
    "evt_jonckheere_terpstra",
    # r9b
    "doc_char_bigram_entropy",
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
