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

# The correctness driver snapshots the FIRST 50 registry entries (dict
# insertion order). Rounds 3/4/5/6 rotated four distinct 50-query sets
# through the window (169 distinct driver-green queries, zero ever-red);
# round 7 ROTATES a FIFTH set in: the flagship (entry() canary) plus 49
# never-driver-sampled, ALL oracle-paired queries — the round-6 verdict's
# named candidates (the statistics + spatial suites: FDR, permutation,
# Kendall, Moran/Geary/LISA, Knox, VaR/CVaR, GPD tails, price index,
# TextRank, suffix ranks, Shapley, Ljung-Box) plus a cross-family fill of
# the remaining never-sampled hypothesis tests, relational OR/allocation
# queries, doc/embedding analytics, streaming interval union, and
# multimodal resolution buckets. Everything certified in earlier rounds
# keeps its green row in those artifacts and stays covered by the
# order-independent full differential gate (scripts/diffcheck.py,
# tests/test_oracle.py), which runs every entry each round.
_PRIORITY: tuple[str, ...] = (
    # entry() flagship — continuity canary across all rounds
    "evt_metrics_r2_mse",
    # round-6 verdict named candidates (statistics + spatial suites)
    "evt_fdr_bh",
    "evt_permutation_test",
    "evt_kendall_tau_matrix",
    "evt_morans_i",
    "evt_geary_c",
    "evt_local_morans",
    "evt_knox_test",
    "evt_var_cvar",
    "evt_pot_gpd_tail",
    "rel_price_index",
    "doc_textrank_keywords",
    "doc_suffix_ranks",
    "evt_shapley_attribution",
    "evt_ljung_box",
    # the round-6 straggler that shipped without its checklist (now fixed)
    "evt_watermark_curve",
    # hypothesis-test suite — never sampled before
    "evt_anova_oneway",
    "evt_kruskal_wallis",
    "evt_wilcoxon_signed_rank",
    "evt_friedman_test",
    "evt_tukey_pairs",
    "evt_mcnemar_test",
    "evt_cohens_kappa",
    "evt_cmh_test",
    "evt_jackknife_ratio",
    "evt_extreme_value_gumbel",
    "evt_mood_median_test",
    "evt_granger_lite",
    "evt_mann_kendall",
    "evt_runs_test",
    "evt_cronbach_alpha",
    "evt_odds_ratio_mh",
    "evt_capture_recapture",
    "evt_p_chart",
    "evt_gof_weekday",
    # relational / operations-research — never sampled before
    "rel_abc_xyz",
    "rel_newsvendor_stock",
    "rel_seat_apportionment",
    "rel_entity_resolution",
    "rel_waterfill_allocation",
    "rel_inventory_fill",
    "rel_price_band_join",
    # text corpus — never sampled before
    "doc_readability_scores",
    "doc_wordpiece_segment",
    "doc_winnowing_fingerprints",
    # embeddings — never sampled before
    "emb_mahalanobis_ood",
    "emb_mmd_drift",
    "emb_dbscan_core_points",
    # streaming + multimodal — never sampled before
    "stream_interval_union",
    "mm_resolution_buckets",
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
