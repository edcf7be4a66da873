"""Correctness gates for the round-4 journey-analytics operators.

``evt_markov_attribution`` has no SQL oracle (linear-system solve), so
its gate is a pure-python reference implementation checked end-to-end
against the distributed transition counts at sf0.001, plus a hand-sized
fixture where the absorption probabilities are known in closed form.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r4b import (
    _markov_transition_counts,
    _removal_effects,
)

SF = "/root/testdata/sf0.001"


def _reference_journeys(sf_dir: str):
    """Pure-python journey builder from the raw parquet (no Spark)."""
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type
        FROM read_parquet('{sf_dir}/events.parquet')
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    journeys: dict[int, list[str]] = {}
    for uid, et in rows:
        journeys.setdefault(uid, []).append(et)
    out = []
    for uid, seq in journeys.items():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        out.append(seq)
    return out


def _reference_counts(journeys):
    counts: dict[tuple[str, str], int] = {}

    def bump(s, d):
        counts[(s, d)] = counts.get((s, d), 0) + 1

    for seq in journeys:
        prev = "START"
        for et in seq:
            bump(prev, et)
            prev = et
        if seq[-1] != "purchase":
            bump(seq[-1], "NULL")
    return counts


def test_transition_counts_match_pure_python(spark):
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in _markov_transition_counts(spark, SF).collect()
    }
    want = _reference_counts(_reference_journeys(SF))
    assert got == want


def test_removal_effects_closed_form():
    """Two-channel chain with known absorption probabilities.

    START -> A (always).  A -> purchase w.p. 0.5, A -> B w.p. 0.5.
    B -> purchase w.p. 0.5, B -> NULL w.p. 0.5.
    p_base = 0.5 + 0.5*0.5 = 0.75.
    Remove A: START's only edge is lost -> p = 0, effect 1.
    Remove B: p = 0.5, effect = 1 - 0.5/0.75 = 1/3.
    """
    triples = [
        ("START", "A", 4),
        ("A", "purchase", 2),
        ("A", "B", 2),
        ("B", "purchase", 1),
        ("B", "NULL", 1),
    ]
    effects = {ch: (pb, eff) for ch, pb, eff in _removal_effects(triples)}
    assert effects["A"][0] == pytest.approx(0.75)
    assert effects["A"][1] == pytest.approx(1.0)
    assert effects["B"][1] == pytest.approx(1.0 / 3.0)


def test_markov_attribution_end_to_end(spark):
    """The registered query equals the pure-python pipeline at sf0.001."""
    got = {
        r["channel"]: (r["p_base"], r["removal_effect"])
        for r in REGISTRY["evt_markov_attribution"].spark_fn(spark, SF).collect()
    }
    counts = _reference_counts(_reference_journeys(SF))
    want = {
        ch: (round(pb, 6), round(eff, 6))
        for ch, pb, eff in _removal_effects(
            [(s, d, n) for (s, d), n in counts.items()]
        )
    }
    assert got == want
    # every removal effect is a probability-ratio quantity
    for pb, eff in got.values():
        assert 0.0 <= pb <= 1.0
        assert eff <= 1.0


def test_windowed_funnel_single_data_exchange(spark):
    """The three stage-threshold windows chain behind ONE user_id
    exchange (the per-stage self-join anti-pattern would pay three);
    the only other exchange is the final single-partition 3-counter
    fold."""
    df = REGISTRY["evt_windowed_funnel"].spark_fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_audience_overlap_single_scan(spark):
    """Pair counts AND audience sizes come out of one lineage: one
    parquet scan, one data-sized exchange (collect_set), the rest are
    |types|²-row frames."""
    df = REGISTRY["evt_audience_overlap"].spark_fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_audience_overlap_diagonal_consistency(spark):
    """n_both ≤ min(n_a, n_b) and Jaccard ∈ (0, 1] on real data."""
    rows = REGISTRY["evt_audience_overlap"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0


def test_removal_effect_bounds_random():
    """Removal effects from random count matrices stay ≤ 1 and the
    solve never diverges (A is strictly diagonally dominant for
    sub-stochastic transient blocks)."""
    rng = np.random.default_rng(7)
    chans = ["a", "b", "c"]
    for _ in range(25):
        triples = [("START", c, int(rng.integers(1, 10))) for c in chans]
        for s in chans:
            for d in chans + ["purchase", "NULL"]:
                n = int(rng.integers(0, 10))
                if n and d != s:
                    triples.append((s, d, n))
        for ch, pb, eff in _removal_effects(triples):
            assert 0.0 <= pb <= 1.0
            assert eff <= 1.0 + 1e-12


def test_knn_communities_match_pure_python(spark):
    """The registered LPA query equals a pure-python twin run on the
    same collected edges (mode label, ties -> smallest, 5 synchronous
    rounds)."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r4b import (
        _knn_edges,
    )

    edges = [(r["src"], r["dst"]) for r in _knn_edges(spark, SF, 5).collect()]
    nbrs: dict[int, list[int]] = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
    labels = {n: n for n in nbrs}
    for _ in range(5):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for d in ns:
                counts[labels[d]] = counts.get(labels[d], 0) + 1
            # plurality, ties -> smallest label
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    want: dict[int, int] = {}
    for lab in labels.values():
        want[lab] = want.get(lab, 0) + 1
    got = {
        r["community"]: r["n_members"]
        for r in REGISTRY["emb_knn_communities"].spark_fn(spark, SF).collect()
    }
    assert got == want
    # sanity: plurality propagation found real structure (not all
    # singletons, not one blob)
    assert 1 < len(got) < len(labels)


def test_hll_overlap_tracks_exact(spark):
    """The sketch inclusion-exclusion estimate lands within a tight
    relative band of the exact pair counts (lgk=14 → rsd ≈ 0.8 %; the
    subtraction amplifies to a few % of the union size)."""
    exact = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_both"])
        for r in REGISTRY["evt_audience_overlap"].spark_fn(spark, SF).collect()
    }
    est = {
        (r["type_a"], r["type_b"]): r["est_overlap"]
        for r in REGISTRY["evt_hll_audience_overlap"]
        .spark_fn(spark, SF)
        .collect()
    }
    assert set(est) == set(exact)
    for key, e in est.items():
        n_a, n_b, n_both = exact[key]
        union = n_a + n_b - n_both
        # 5 % of the union + small absolute slack absorbs the
        # inclusion-exclusion error amplification at these cardinalities
        assert abs(e - n_both) <= 0.05 * union + 3, (key, e, n_both)


def test_scene_cuts_consistency(spark):
    """Scene counts: n_scenes = n_cuts + 1, cuts < frames, and only
    video assets (doc_id % 3 == 2) appear."""
    rows = REGISTRY["mm_scene_cuts"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["asset_id"] % 3 == 2
        assert r["n_scenes"] == r["n_cuts"] + 1
        assert r["n_cuts"] <= max(r["n_frames"] - 1, 0)


def test_asof_nearest_hand_fixture(spark):
    """Tie → earlier right row; no-prev → forward match; equal-ts → Δ=0."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.asof import (
        asof_nearest_join,
    )

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 00:00:10"),   # prev@5s, next@15s: tie → prev
         (2, "k", "2024-01-01 00:00:02"),   # no prev → next@5s
         (3, "k", "2024-01-01 00:00:15"),   # right exactly at ts → Δ=0
         (4, "z", "2024-01-01 00:00:01")],  # no rights at all → NULL
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:05", 50),
         ("k", "2024-01-01 00:00:15", 150)],
        "user_id string, ts_s string, rv long",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "rv")
    out = {
        r["event_id"]: (r["rv_near"])
        for r in asof_nearest_join(
            left, right, key=["user_id"], value_col="rv"
        ).collect()
    }
    assert out == {1: 50, 2: 50, 3: 150, 4: None}


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES with weight = value must over-represent heavy rows: the
    mean weight of the sample beats the population mean per type."""
    import duckdb

    pop = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""SELECT event_type, avg(round(value*100))
            FROM read_parquet('{SF}/events.parquet')
            WHERE round(value*100) > 0 GROUP BY 1"""
        ).fetchall()
    }
    rows = REGISTRY["evt_weighted_sample"].spark_fn(spark, SF).collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["w"])
    assert set(by_type) == set(pop)
    # aggregate across types: sample mean well above population mean
    samp = [w for ws in by_type.values() for w in ws]
    pop_mean = sum(pop.values()) / len(pop)
    assert sum(samp) / len(samp) > 1.2 * pop_mean


def test_allpairs_cap_raises(spark):
    """A corpus-sized misuse of the all-pairs evaluator raises instead
    of shipping an unbounded broadcast (the op is quadratic by
    definition and gated to eval samples)."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.similarity import (
        ALLPAIRS_MAX_ROWS,
        allpairs_knn_topk,
    )

    big = spark.range(ALLPAIRS_MAX_ROWS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        F.lit(0).alias("label"),
    )
    with pytest.raises(AssertionError, match="eval-sample"):
        allpairs_knn_topk(big, k=3)


def test_eb_shrinkage_properties(spark):
    """Shrinkage must pull extremes toward the global mean, and
    harder for small-n users: |shrunk − m| ≤ |raw − m| (up to the
    1e-6 rounding), and posterior stays inside (0, 1)."""
    rows = REGISTRY["evt_eb_shrunk_rates"].spark_fn(spark, SF).collect()
    assert rows
    m = sum(r["x"] for r in rows) / sum(r["n"] for r in rows)
    for r in rows:
        assert 0.0 <= r["shrunk_rate"] <= 1.0
        # posterior lies between the raw rate and (approximately) the
        # prior mean — shrinkage never overshoots past the data side
        lo, hi = sorted([r["raw_rate"], m])
        assert lo - 0.2 <= r["shrunk_rate"] <= hi + 0.2
    # small-n users move more (relative shrink toward the mean)
    small = [r for r in rows if r["n"] <= 30 and abs(r["raw_rate"] - m) > 0.02]
    big = [r for r in rows if r["n"] >= 80 and abs(r["raw_rate"] - m) > 0.02]
    if small and big:
        move = lambda r: abs(r["shrunk_rate"] - r["raw_rate"]) / abs(
            r["raw_rate"] - m
        )
        assert (sum(map(move, small)) / len(small)) >= (
            sum(map(move, big)) / len(big)
        )


def test_approx_percentiles_rank_error(spark):
    """GK sketch contract: each approximate percentile's true rank is
    within n/accuracy (+slack) of the target rank, per type."""
    import duckdb

    rows = REGISTRY["evt_approx_percentiles"].spark_fn(spark, SF).collect()
    assert rows
    con = duckdb.connect()
    for r in rows:
        for q, col in [(0.5, "p50_c"), (0.9, "p90_c"), (0.99, "p99_c")]:
            v = r[col]
            rank = con.execute(
                f"""SELECT count(*) FROM read_parquet('{SF}/events.parquet')
                WHERE event_type = ? AND CAST(round(value*100) AS BIGINT) <= ?""",
                [r["event_type"], v],
            ).fetchone()[0]
            target = q * r["n"]
            assert abs(rank - target) <= r["n"] / 10000 + 2, (
                r["event_type"], col, rank, target,
            )


def test_pit_matrix_no_leakage(spark):
    """Leakage audit: every feature value must be derivable from events
    at-or-before the label timestamp — checked independently against
    the raw parquet (the matrix's last_click_c must equal the latest
    click value at-or-before ts, and views_before the count of views
    at-or-before ts)."""
    import duckdb

    rows = REGISTRY["evt_pit_training_matrix"].spark_fn(spark, SF).collect()
    assert rows
    con = duckdb.connect()
    for r in rows[:40]:
        want_clicks = con.execute(
            f"""SELECT CAST(round(value*100) AS BIGINT) FROM
            read_parquet('{SF}/events.parquet')
            WHERE user_id = ? AND event_type = 'click' AND ts <= ?
            ORDER BY ts DESC, event_id DESC LIMIT 1""",
            [r["user_id"], r["ts"]],
        ).fetchone()
        assert (want_clicks[0] if want_clicks else None) == r["last_click_c"]
        n_views = con.execute(
            f"""SELECT count(*) FROM read_parquet('{SF}/events.parquet')
            WHERE user_id = ? AND event_type = 'view' AND ts <= ?""",
            [r["user_id"], r["ts"]],
        ).fetchone()[0]
        assert n_views == r["views_before"]
