"""Independent cross-checks for the round-4 statistics/attribution
queries: scipy/numpy references where available, invariant gates
otherwise (the DuckDB differential covers value equality; these check
the MATH is the intended statistic)."""

import numpy as np
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF).toPandas()


def test_ks_drift_matches_numpy_ecdf(spark):
    out = _run(spark, "evt_ks_drift").set_index("event_type")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(round(value*100) AS BIGINT) AS v",
            "day(ts) >= 16 AS late",
        )
        .toPandas()
    )
    for et, g in ev.groupby("event_type"):
        a = np.sort(g.loc[~g.late, "v"].values)
        b = np.sort(g.loc[g.late, "v"].values)
        pooled = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(a, pooled, side="right")
        f2 = np.searchsorted(b, pooled, side="right")
        ks = np.max(np.abs(f1 / len(a) - f2 / len(b)))
        row = out.loc[et]
        assert row["n1"] == len(a) and row["n2"] == len(b)
        assert row["ks_stat"] == pytest.approx(ks, abs=1e-6)


def test_ols_features_matches_numpy_lstsq(spark):
    out = _run(spark, "evt_ols_features")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "ts", "event_id",
            "CAST(round(value*100) AS BIGINT) AS y",
        )
        .toPandas()
        .sort_values(["user_id", "event_type", "ts", "event_id"])
    )
    checked = 0
    for (u, et), g in ev.groupby(["user_id", "event_type"]):
        y = g["y"].values.astype(float)
        if len(y) < 9:
            continue
        idx = np.arange(1, len(y) + 1, dtype=float)
        X = np.column_stack([np.ones(len(y) - 1), y[:-1], idx[1:]])
        beta, *_ = np.linalg.lstsq(X, y[1:], rcond=None)
        row = out[(out.user_id == u) & (out.event_type == et)]
        if row.empty:
            continue
        got = row.iloc[0]
        assert got["intercept"] == pytest.approx(beta[0], abs=1e-4)
        assert got["beta_lag"] == pytest.approx(beta[1], abs=1e-4)
        assert got["beta_idx"] == pytest.approx(beta[2], abs=1e-4)
        checked += 1
    assert checked >= 10


def test_rank_auc_matches_numpy(spark):
    out = _run(spark, "evt_rank_auc").set_index("event_type")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(round(value*100) AS BIGINT) AS v",
            "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS pos",
        )
        .toPandas()
    )
    for et, g in ev.groupby("event_type"):
        neg = g.loc[g.pos == 0, "v"].values
        pos = g.loc[g.pos == 1, "v"].values
        # AUC by pairwise comparison (ties count half) — O(n0*n1) is
        # fine at sf0.001 and is the definitional cross-check
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        row = out.loc[et]
        assert row["n0"] == len(neg) and row["n1"] == len(pos)
        assert row["auc"] == pytest.approx(auc, abs=1e-6)


def test_attribution_credits_conserve(spark):
    out = _run(spark, "evt_attribution")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_id", "CAST(round(value*100) AS BIGINT) AS value_c",
            "event_type",
        )
        .toPandas()
    )
    purchases = ev[ev.event_type == "purchase"].set_index("event_id")["value_c"]
    got = out.groupby("purchase_id")["credit_c"].sum()
    # every attributed purchase's credits sum EXACTLY to its cents
    for pid, total in got.items():
        assert total == purchases.loc[pid], pid
    # and per-touch credits never differ by more than 1 cent
    spread = out.groupby("purchase_id")["credit_c"].agg(lambda s: s.max() - s.min())
    assert (spread <= 1).all()


def test_repeated_spans_are_maximal_and_disjoint(spark):
    out = _run(spark, "doc_repeated_spans")
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("start_tok")
        # spans within a doc never overlap and are separated by >= 1
        # non-duplicated gram position (maximality)
        prev_end = -10
        for _, r in g.iterrows():
            assert r.start_tok > prev_end + 1 - 4  # gram-start gap > 1
            assert r.span_tokens == r.end_tok - r.start_tok + 1
            prev_end = r.end_tok


def test_mmr_matches_numpy_reference(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    out = REGISTRY["emb_mmr_rerank"].spark_fn(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in emb.itertuples()}

    lam, k, pool = 0.7, 5, 20
    for qid in range(10):
        q = vecs[qid]
        qn = q / np.linalg.norm(q)
        sims = {}
        for vid, v in vecs.items():
            if vid == qid:
                continue
            sims[vid] = round(float(np.dot(qn, v / np.linalg.norm(v))), 6)
        cand = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:pool]
        ids = [c[0] for c in cand]
        rel = np.array([c[1] for c in cand])
        V = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
        S = V @ V.T
        selected, remaining = [], list(range(len(ids)))
        while remaining and len(selected) < k:
            red = (
                S[np.ix_(remaining, selected)].max(axis=1)
                if selected
                else np.zeros(len(remaining))
            )
            mmr = lam * rel[remaining] - (1 - lam) * red
            j = int(np.argmax(mmr))
            selected.append(remaining[j])
            remaining.pop(j)
        want = [ids[s] for s in selected]
        got = (
            out[out.query_id == qid]
            .sort_values("mmr_rank")["neighbor_id"]
            .tolist()
        )
        assert got == want, f"query {qid}: {got} != {want}"


def test_cms_bounds_vs_exact(spark):
    """CMS guarantees vs exact counts on real data: one-sided
    overestimate everywhere, and error within eps*N for the top keys
    (w=2048 -> eps = e/w ~ 0.0013)."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from pyspark.sql import functions as F

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("hh_key", F.concat_ws("|", "user_id", "event_type"))
    )
    n_total = ev.count()
    exact = {
        r.hh_key: r.cnt
        for r in ev.groupBy("hh_key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    sketch = cms_build(ev, "hh_key", d=4, w=2048)
    cand = ev.select("hh_key").distinct()
    est = {
        r.key: r.est
        for r in cms_estimate(sketch, cand, "hh_key", d=4, w=2048).collect()
    }
    eps_n = (2.718281828 / 2048) * n_total
    for k, true in exact.items():
        assert est[k] >= true, k  # one-sided: never underestimates
        assert est[k] <= true + max(eps_n, 1) * 4, k  # loose w.h.p. bound

    # mergeability: sketch(A) + sketch(B) == sketch(A union B) cell-wise
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cms_merge(
        cms_build(a, "hh_key", d=4, w=2048), cms_build(b, "hh_key", d=4, w=2048)
    )
    whole = cms_build(ev, "hh_key", d=4, w=2048)
    mp = {(r.depth, r.bucket): r.cnt for r in merged.collect()}
    wp = {(r.depth, r.bucket): r.cnt for r in whole.collect()}
    assert mp == wp


def test_hll_rollup_accuracy(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    out = REGISTRY["evt_hll_rollup_distinct"].spark_fn(spark, SF).toPandas()
    assert len(out) == 5
    for _, r in out.iterrows():
        err = abs(r.est_distinct_users - r.exact_distinct_users)
        assert err <= max(3, 0.02 * r.exact_distinct_users), dict(r)


def test_hll_union_equals_direct(spark):
    """Union of daily sketches must estimate identically to one sketch
    built over the whole range — the mergeability that makes the
    rollup table valid at any grain."""
    from pyspark.sql import functions as F

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("event_type", "user_id", "to_date(ts) AS day")
    )
    via_days = (
        ev.groupBy("event_type", "day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est")
    )
    a = {r.event_type: r.est for r in via_days.collect()}
    b = {r.event_type: r.est for r in direct.collect()}
    assert a == b


def test_random_projection_preserves_distances(spark):
    """JL property: pairwise L2 distances in the 16-dim projection
    (scaled by 1/sqrt(16)) approximate the 64-dim distances. With a
    +-1 matrix the distortion concentrates around 1; assert a generous
    [0.4, 1.9] band on real pairs and a tight band on the MEAN."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    out = REGISTRY["emb_random_projection"].spark_fn(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    orig = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in emb.itertuples()}
    proj = {
        vid: g.sort_values("j")["out_micro"].to_numpy() / 1e6
        for vid, g in out.groupby("vec_id")
    }
    rng_ids = sorted(orig)[:30]
    ratios = []
    for a in rng_ids:
        for b in rng_ids:
            if a >= b:
                continue
            d0 = np.linalg.norm(orig[a] - orig[b])
            d1 = np.linalg.norm(proj[a] - proj[b]) / np.sqrt(16)
            if d0 > 1e-9:
                ratios.append(d1 / d0)
    ratios = np.array(ratios)
    assert len(ratios) > 300
    assert ((ratios > 0.4) & (ratios < 1.9)).mean() > 0.99
    assert 0.9 < ratios.mean() < 1.1


def test_bootstrap_ci_brackets_true_mean(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
    from pyspark.sql import functions as F

    out = (
        REGISTRY["evt_poisson_bootstrap_ci"].spark_fn(spark, SF)
        .toPandas().set_index("event_type")
    )
    truth = {
        r.event_type: r.m
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) * 1000000
             / F.count(F.lit(1))).alias("m")
        )
        .collect()
    }
    for et, row in out.iterrows():
        assert row.p05_micro <= row.p50_micro <= row.p95_micro
        # 90% CI over 100 replicas should bracket the plug-in mean
        assert row.p05_micro <= truth[et] <= row.p95_micro, (et, dict(row))


def test_phash_identical_payloads(spark):
    """Byte-identical payloads must always pair at hamming 0."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.multimodal import (
        phash_media,
        phash_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "image", b"the same payload bytes the same payload bytes"),
         (2, "image", b"the same payload bytes the same payload bytes"),
         (3, "image", b"completely different content with other words here")],
        "asset_id long, media_type string, payload binary",
    )
    pairs = phash_near_dup_pairs(phash_media(df)).toPandas()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs.itertuples()] == [(1, 2, 0)]


def test_phash_pairs_are_textually_similar(spark):
    """Emitted near-dup pairs must be REAL near-dups: their payload
    4-gram Jaccard must clear a floor that random pairs do not."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    pairs = REGISTRY["mm_phash_near_dup"].spark_fn(spark, SF).toPandas()
    assert len(pairs) > 0
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def jac(a, b):
        ga = {a[i : i + 4] for i in range(len(a) - 3)}
        gb = {b[i : i + 4] for i in range(len(b) - 3)}
        return len(ga & gb) / max(1, len(ga | gb))

    sims = [jac(docs[r.id_a], docs[r.id_b]) for r in pairs.itertuples()]
    assert min(sims) > 0.3
    # baseline: consecutive-id pairs (mostly unrelated) sit far lower
    base = [jac(docs[i], docs[i + 1]) for i in range(0, 60, 2)]
    assert sum(sims) / len(sims) > 2 * (sum(base) / len(base))


def test_pca_matches_numpy(spark):
    """Distributed integer-partial PCA == full-data numpy PCA: same
    explained variances, same projections (shared sign convention)."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.pca import (
        MICRO,
        pca_fit,
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    emb_df = spark.read.parquet(f"{SF}/embeddings.parquet")
    comps, ev, mean = pca_fit(spark, emb_df, k=8)

    pdf = emb_df.toPandas()
    V = np.stack(pdf["embedding"].to_numpy()).astype(float)
    Q = np.rint(V * MICRO) / MICRO  # same quantization as the operator
    m = Q.mean(axis=0)
    cov = np.cov(Q.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    ref_ev = w[order]
    ref_comps = v[:, order].T
    for c in ref_comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1

    assert np.allclose(ev, ref_ev, rtol=1e-9, atol=1e-12)
    assert np.allclose(mean, m, atol=1e-12)
    assert np.allclose(comps, ref_comps, atol=1e-8)

    out = (
        REGISTRY["emb_pca_project"].spark_fn(spark, SF).toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    # the operator projects the RAW vectors (quantization exists only
    # to make the fit exact), so compare against V with a tolerance
    # covering the micro-quantization of the mean (~1e-6 * sqrt(d))
    ref_proj = (V - m) @ ref_comps.T
    got = out[[f"pc{i}" for i in range(8)]].to_numpy()
    assert np.allclose(got, ref_proj, atol=1e-4)
    # variance actually concentrates: top-8 capture a nontrivial share
    assert ev.sum() / w.sum() > 0.2


def test_logreg_matches_sequential_reference(spark):
    """Distributed GD == sequential numpy GD bit-for-bit: the per-row
    micro-quantized gradient partials make the distributed sum exact,
    so cluster partitioning cannot change the fitted weights."""
    import numpy as np
    from pyspark.sql import functions as F

    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.logreg import (
        MICRO,
        logreg_fit,
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    base = emb.select(
        F.col("embedding").cast("array<double>").alias("e"),
        (F.col("label") % 2).cast("double").alias("y"),
    )
    pdf = base.toPandas()
    X = np.stack(pdf["e"].to_numpy()).astype(np.float64)
    y = pdf["y"].to_numpy().astype(np.float64)

    n_iter, lr, l2 = 10, 2.0, 1e-3
    w_ref = np.zeros(X.shape[1])
    b_ref = 0.0
    n = len(y)
    for _ in range(n_iter):
        z = X @ w_ref + b_ref
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.rint((X * r[:, None]) * MICRO).astype(np.int64).sum(axis=0)
        gb = np.rint(r * MICRO).astype(np.int64).sum()
        w_ref = w_ref - lr * (g / n / MICRO + l2 * w_ref)
        b_ref = b_ref - lr * (gb / n / MICRO)

    # distributed fit over a deliberately re-partitioned frame
    w, b, losses = logreg_fit(
        base.repartition(7), vec_col="e", y_col="y", n_iter=n_iter,
        lr=lr, l2=l2,
    )
    assert np.array_equal(w, w_ref), "weights must be bit-identical"
    assert b == b_ref
    assert len(losses) == n_iter and losses[-1] < losses[0]
