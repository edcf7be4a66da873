"""Property gates for the round-6b operators (plans/queries_r6b.py).

Differential hashes (diffcheck/driver) prove engine == oracle; these
tests pin the ALGORITHMIC invariants both sides could get wrong
together: PAV's minimax equivalence, CDC's shift re-synchronization,
WordPiece's greedy reconstruction, LTTB's endpoint/count contract,
Z-order's skipping advantage over a linear sort, CMS one-sidedness.
"""

from __future__ import annotations

import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r6b import (
    _WP_VOCAB,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- PAV


def _pav_blocks(ys, ws):
    blocks = []
    for y, w in zip(ys, ws):
        s, c, n = y, w, 1
        while blocks and Fraction(blocks[-1][0], blocks[-1][1]) >= Fraction(
            s, c
        ):
            ps, pc, pn = blocks.pop()
            s += ps
            c += pc
            n += pn
        blocks.append((s, c, n))
    out = []
    for s, c, n in blocks:
        out += [Fraction(s, c)] * n
    return out


def _minimax(ys, ws):
    n = len(ys)
    ps, pw = [0], [0]
    for y, w in zip(ys, ws):
        ps.append(ps[-1] + y)
        pw.append(pw[-1] + w)

    def avg(j, k):
        return Fraction(ps[k + 1] - ps[j], pw[k + 1] - pw[j])

    return [
        max(
            min(avg(j, k) for k in range(i, n)) for j in range(i + 1)
        )
        for i in range(n)
    ]


def test_pav_equals_minimax_oracle_form():
    """The oracle computes max-min averages; the engine runs the PAV
    stack — they must be the same function (exact rationals)."""
    rng = random.Random(20260814)
    for _ in range(200):
        n = rng.randint(1, 14)
        ys = [rng.randint(-80, 80) for _ in range(n)]
        ws = [rng.randint(1, 6) for _ in range(n)]
        assert _pav_blocks(ys, ws) == _minimax(ys, ws)


def test_isotonic_output_is_monotone(spark):
    pdf = (
        REGISTRY["evt_isotonic_calibration"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "hour"])
    )
    for _, g in pdf.groupby("event_type"):
        fitted = list(g["fitted_micro"])
        assert fitted == sorted(fitted), "PAV output must be non-decreasing"


# ---------------------------------------------------------------- CDC


def _cdc_fps(s: str) -> list[str]:
    import hashlib

    pow31 = [31**k for k in range(8)]
    out, cur = [], []
    for i, ch in enumerate(s):
        cur.append(ch)
        if i >= 7:
            roll = sum(ord(s[i - k]) * pow31[k] for k in range(8))
            if roll % 64 == 0:
                out.append(hashlib.md5("".join(cur).encode()).hexdigest())
                cur = []
    if cur:
        out.append(hashlib.md5("".join(cur).encode()).hexdigest())
    return out


def test_cdc_resynchronizes_after_prefix_insert():
    """THE property fixed-size chunking lacks: a prefix edit may only
    change chunks up to the first boundary after the edit — the
    boundary rule depends on an 8-char window only, so cuts (hence
    chunk fingerprints) re-align beyond it."""
    rng = random.Random(7)
    base = "".join(
        rng.choice("abcdefgh ij klmnop") for _ in range(400)
    )
    a = _cdc_fps(base)
    b = _cdc_fps("XY" + base)
    assert len(a) > 3, "need several chunks for the property to bite"
    # every chunk of the original except (at most) the first must
    # reappear verbatim in the edited stream's chunk list
    assert set(a[1:]) <= set(b)


# ---------------------------------------------------------- WordPiece


def _wp_segment(w: str) -> list[str]:
    pos, pieces = 0, []
    while pos < len(w):
        best = None
        for piece, raw, cont in _WP_VOCAB:
            if cont != (pos > 0):
                continue
            if w.startswith(raw, pos) and (
                best is None or len(raw) > len(best[1])
            ):
                best = (piece, raw)
        assert best is not None, "char-complete vocab can't miss"
        pos += len(best[1])
        pieces.append(best[0])
    return pieces


def test_wordpiece_reconstructs_and_marks_continuations():
    for w in ["table", "scan", "window", "spark", "a", "customer"]:
        pieces = _wp_segment(w)
        raw = "".join(p[2:] if p.startswith("##") else p for p in pieces)
        assert raw == w
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])


def test_wordpiece_greedy_prefers_longest():
    # 'ta' + '##ble' must beat the char-by-char path for 'table'
    assert _wp_segment("table") == ["ta", "##ble"]


# --------------------------------------------------------------- LTTB


def test_lttb_contract(spark):
    pdf = (
        REGISTRY["evt_lttb_downsample"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "tm"])
    )
    for et, g in pdf.groupby("event_type"):
        assert len(g) == 12, f"{et}: expected 12 downsampled points"
        assert list(g["tm"]) == sorted(g["tm"])
        assert g["tm"].iloc[0] == 0, "first point is the series start"


# ------------------------------------------------------------ Z-order


def test_zorder_spans_beat_linear_layout():
    """Z-order zone maps must be tighter on the SECOND dimension than
    a linear sort on x, for the same bucket count (the whole point of
    interleaving)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    morton_sql = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    )
    z = con.execute(
        f"""
        WITH d AS (
          SELECT CAST(user_id % 256 AS BIGINT) AS x,
                 CAST((hour(ts) * 60 + minute(ts)) // 6 AS BIGINT) AS y
          FROM events),
        m AS (SELECT x, y, CAST({morton_sql} AS BIGINT) AS k FROM d)
        SELECT sum(yspan) FROM (
          SELECT max(y) - min(y) AS yspan FROM m GROUP BY k >> 8)
        """
    ).fetchone()[0]
    lin = con.execute(
        """
        WITH d AS (
          SELECT CAST(user_id % 256 AS BIGINT) AS x,
                 CAST((hour(ts) * 60 + minute(ts)) // 6 AS BIGINT) AS y,
                 ntile(150) OVER (ORDER BY user_id % 256, ts) AS f
          FROM events)
        SELECT sum(yspan) FROM (
          SELECT max(y) - min(y) AS yspan FROM d GROUP BY f)
        """
    ).fetchone()[0]
    assert z < lin, f"zorder y-span {z} must beat linear-sort {lin}"


# ------------------------------------------------------ CMS, AB, HW


def test_cms_never_undercounts(spark):
    pdf = REGISTRY["evt_cms_portable_check"].spark_fn(spark, SF).toPandas()
    assert (pdf["overcount"] >= 0).all()
    assert (pdf["cms_est"] >= pdf["exact_n"]).all()


def test_ab_assignment_is_total_and_two_sided(spark):
    pdf = REGISTRY["evt_ab_assignment"].spark_fn(spark, SF).toPandas()
    g = pdf.groupby("event_type")
    for et, rows in g:
        assert set(rows["variant"]) == {"control", "treatment"}
        assert (rows["n_events"].sum() == rows["type_total"].iloc[0])


def test_holt_winters_seasonal_slots_complete(spark):
    pdf = REGISTRY["evt_holt_winters_check"].spark_fn(spark, SF).toPandas()
    for et, rows in pdf.groupby("event_type"):
        assert sorted(rows["slot"]) == list(range(9))


# --------------------------------------------- OOD / variant / masks


def test_mahalanobis_topk_contract(spark):
    pdf = REGISTRY["emb_mahalanobis_ood"].spark_fn(spark, SF).toPandas()
    assert (pdf["score"] >= 0).all()
    for _, g in pdf.groupby("label"):
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))
        ordered = g.sort_values("rnk")
        assert list(ordered["score"]) == sorted(ordered["score"], reverse=True)


def test_behavior_cohort_masks_consistent(spark):
    pdf = REGISTRY["evt_behavior_cohorts"].spark_fn(spark, SF).toPandas()
    for r in pdf.itertuples():
        assert 1 <= r.type_mask <= 31
        assert r.n_types == bin(int(r.type_mask)).count("1")
    assert pdf["type_mask"].is_unique


def test_variant_path_equals_string_json_path(spark):
    """The VARIANT representation must not change typed semantics —
    compare against the get_json_object string path inside Spark."""
    variant = (
        REGISTRY["evt_props_variant"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "k_decade"])
        .reset_index(drop=True)
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
        keyed_events,
    )

    ev = keyed_events(spark, SF)
    k = F.get_json_object("props", "$.k").cast("bigint")
    legacy = (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("k") / 10).cast("bigint").alias("k_decade"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
        )
        .toPandas()
        .sort_values(["event_type", "k_decade"])
        .reset_index(drop=True)
    )
    assert variant.equals(legacy)


# ------------------------------------- late-wave ops (batches 5-12)


def test_waterfall_is_monotone_decreasing(spark):
    pdf = (
        REGISTRY["doc_filter_waterfall"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("stage")
    )
    s = list(pdf["survivors"])
    assert s == sorted(s, reverse=True), "each filter can only remove"
    assert pdf["survival_micro"].iloc[0] == 1000000


def test_watermark_curve_monotone_in_delay(spark):
    pdf = REGISTRY["evt_watermark_curve"].spark_fn(spark, SF).toPandas()
    for _, g in pdf.groupby("event_type"):
        g = g.sort_values("delay_s")
        d = list(g["n_dropped"])
        assert d == sorted(d, reverse=True), (
            "a longer watermark delay can only drop fewer events"
        )


def test_k_anonymity_internal_consistency(spark):
    r = (
        REGISTRY["evt_k_anonymity_audit"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    assert 0 <= r["rows_below_k5"] <= r["rows_below_k20"] <= r["n_rows"]
    assert r["min_k"] >= 1 and r["n_classes"] >= 1


def test_join_estimator_exact_on_fk_join(spark):
    """orders→customer is a clean FK join: every customer key is
    uniform, so heavy-hitters + uniform residual must estimate the
    size EXACTLY (est_over_actual == 1.0)."""
    r = (
        REGISTRY["rel_join_size_estimator"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    assert r["total_est"] == r["actual"]
    assert r["est_over_actual_micro"] == 1000000


def test_histogram_quantile_bucket_contains_exact(spark):
    pdf = (
        REGISTRY["evt_histogram_quantile_check"]
        .spark_fn(spark, SF)
        .toPandas()
    )
    assert (pdf["bucket_contains"] == 1).all(), (
        "the histogram's quantile bucket must contain the exact value"
    )


def test_bandit_replay_accounting(spark):
    pdf = REGISTRY["evt_bandit_replay"].spark_fn(spark, SF).toPandas()
    arms = pdf[pdf["arm"] != "_replay"]
    total = pdf[pdf["arm"] == "_replay"].iloc[0]
    assert arms["pulls"].sum() == total["pulls"]
    assert arms["wins"].sum() == total["wins"]
    assert (arms["wins"] <= arms["pulls"]).all()
    assert total["pulls"] > 0, "the policy must match some logged events"


def test_next_event_prediction_bounds(spark):
    pdf = (
        REGISTRY["evt_next_event_prediction"].spark_fn(spark, SF).toPandas()
    )
    assert (pdf["n_correct"] <= pdf["n_test"]).all()
    assert pdf["n_test"].sum() > 0
    assert (
        (pdf["accuracy_micro"] >= 0) & (pdf["accuracy_micro"] <= 1000000)
    ).all()


def test_lsh_cost_model_identity(spark):
    """The histogram prediction is an arithmetic identity: each bucket
    of size n emits exactly C(n,2) raw pairs per band; cross-band
    dedup can only shrink the union."""
    pdf = (
        REGISTRY["doc_lsh_cost_estimator"].spark_fn(spark, SF).toPandas()
    )
    assert (pdf["pred_pairs"] == pdf["raw_pairs"]).all()
    assert (pdf["distinct_pairs"].iloc[0] <= pdf["raw_pairs"].sum())


def test_shard_plan_conserves_vectors(spark):
    import duckdb

    pdf = REGISTRY["emb_shard_plan"].spark_fn(spark, SF).toPandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert pdf["n_vectors"].sum() == total, "every vector lands in a shard"
    assert (pdf["largest_cell"] <= pdf["n_vectors"]).all()


# ------------------------------------------------------- suffix ranks


def test_suffix_ranks_match_direct_python_sort(spark):
    import duckdb

    pdf = (
        REGISTRY["doc_suffix_ranks"].spark_fn(spark, SF).toPandas()
    )
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id,
              substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     1, 40) AS s
            FROM '{SF}/documents.parquet' WHERE doc_id < 32"""
    ).fetchall()
    sufs = [
        (did, p, s[p:]) for did, s in docs for p in range(len(s))
    ]
    order = sorted(set(x[2] for x in sufs))
    rank = {s: i + 1 for i, s in enumerate(order)}
    expect = {(did, p): rank[s] for did, p, s in sufs}
    got = {
        (int(r.doc_id), int(r.pos)): int(r.suffix_rank)
        for r in pdf.itertuples()
    }
    assert got == expect
