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
from . import queries_r12a  # noqa: E402,F401
from . import queries_r12b  # noqa: E402,F401
from . import queries_r12c  # noqa: E402,F401
from . import queries_r12d  # noqa: E402,F401
from . import queries_r12e  # noqa: E402,F401
from . import queries_r12f  # noqa: E402,F401
from . import queries_r12g  # noqa: E402,F401
from . import queries_r12h  # noqa: E402,F401
from . import queries_r12i  # noqa: E402,F401
from . import queries_r12j  # noqa: E402,F401

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). NEXT ROTATION: run `python scripts/rotation_candidates.py`
# — it unions all committed CORRECTNESS_r*.json and lists the
# never-driver-sampled oracle-paired queries per module; replace the
# tuple below with the flagship + 49 of those.
# Rounds 3–11 rotated nine distinct 50-query sets through the window
# (410 distinct driver-sampled queries; zero §2 query ever red — the
# only two ever-red rows, round-8's evt_gains_table/evt_levene_median,
# were oracle-environment parity breaks, re-certified green in round 9).
# Round 12 ROTATES the TENTH set in: 49 never-sampled queries (per
# scripts/rotation_candidates.py) leading with every remaining r11
# batch entry — including stream_pysink_roundtrip (the Python Data
# Source two-phase-commit roundtrip gets driver history while fresh) —
# plus the TWO STREAMING SKETCH QUERIES that gained portable-state
# oracles this round (stream_heavy_hitters, stream_hll_distinct: their
# first-ever hash rows retire the rows-only driver cells), the two ext
# twin-substituted demos (their rows will demonstrate the new
# driver-visible substituted_by marker), the last r9 singleton
# (evt_nelson_rules, named by the r11 verdict), and the r5/r6/r3
# never-sampled remainder. Everything certified in earlier rounds keeps
# its green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # round-12 newly oracle-paired streaming sketches (first hash rows)
    "stream_heavy_hitters",
    "stream_hll_distinct",
    # ext twin-substituted demos (exercise the substituted_by marker)
    "evt_series_dtw",
    "evt_sketch_profile",
    # r11a
    "evt_cramer_von_mises",
    "evt_cucconi_test",
    # r11b
    "evt_hoeffding_d",
    "evt_somers_d",
    "rel_goodman_kruskal_gamma",
    # r11c
    "evt_l_diversity",
    "evt_mondrian_cuts",
    # r11d
    "evt_smote_bucketed",
    # r11f
    "evt_lepage_components",
    "evt_seq_pattern_support",
    # r11g — Python Data Source sink roundtrip
    "stream_pysink_roundtrip",
    # r11h
    "evt_kendall_w",
    "rel_ruzicka_similarity",
    # r11i
    "doc_contrastive_triplets",
    # r11j
    "evt_hmm_viterbi_check",
    # r11k
    "evt_recurrence_quantification",
    "rel_eoq_components",
    # r9z — last never-sampled r9 entry (r11 verdict callout)
    "evt_nelson_rules",
    # r5 never-sampled remainder
    "doc_bloom_decontaminate",
    "doc_cluster_size_histogram",
    "doc_lsh_tuning_curve",
    "emb_logreg_eval",
    "evt_group_sample",
    "evt_partition_skew_report",
    "evt_peak_detection",
    "evt_time_range_rolling",
    # r6 never-sampled remainder (incl. the oracle-paired twins that
    # back the DRIVER_TWINS map — sampled under their OWN names here)
    "doc_dsir_importance",
    "emb_lloyd_step_check",
    "emb_matryoshka_recall",
    "emb_mmr_check",
    "emb_rrf_fusion",
    "evt_bollinger_bands",
    "evt_cusum_check",
    "evt_drawdown",
    "evt_dtw_check",
    "evt_event_study_car",
    "evt_hll_portable_rollup",
    "evt_markov_absorption_check",
    "evt_rsi",
    # r3 never-sampled picks
    "doc_dup_ngram_fraction",
    "doc_simhash_near_dup",
    "doc_token_entropy",
    "emb_hard_negatives",
    "evt_winsorize",
    "rel_dominant_suppliers",
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
