"""Property gates for the round-6f operators (plans/queries_r6f.py).

Rank statistics are recomputed from raw rows with a plain-Python
midrank ranking (no scipy) — pinning the histogram-rank and pairwise-
rank algebra, not just engine==oracle agreement.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
    t,
)

SF = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def _midranks(values):
    """value -> midrank over the whole sample."""
    cnt = Counter(values)
    out, below = {}, 0
    for v in sorted(cnt):
        out[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    return out


# ------------------------------------------------- Kruskal-Wallis


def test_kruskal_wallis_matches_bruteforce(spark):
    df = _run(spark, "evt_kruskal_wallis")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value_c")
        .toPandas()
    )
    values = rows["value_c"].tolist()
    rank = _midranks(values)
    n = len(values)
    groups = defaultdict(list)
    for et, v in rows.itertuples(index=False):
        groups[et].append(rank[v])
    sum_r2n = sum(sum(g) ** 2 / len(g) for g in groups.values())
    h_raw = 12.0 / (n * (n + 1)) * sum_r2n - 3 * (n + 1)
    cnt = Counter(values)
    ties = sum(c**3 - c for c in cnt.values())
    h_corr = h_raw / (1 - ties / (n**3 - n))
    assert int(r["n"]) == n
    assert int(r["tie_cubes"]) == ties
    assert float(r["h_raw"]) == pytest.approx(h_raw, rel=1e-9)
    assert float(r["h_corrected"]) == pytest.approx(h_corr, rel=1e-9)
    assert float(r["h_corrected"]) >= 0


# ------------------------------------------------- Friedman


def test_friedman_matches_bruteforce(spark):
    df = _run(spark, "evt_friedman_test")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_type", "value_c")
        .toPandas()
    )
    pivot = rows.pivot_table(
        index="user_id",
        columns="event_type",
        values="value_c",
        aggfunc="sum",
        fill_value=0,
    ).reindex(columns=TYPES, fill_value=0)
    n, k = len(pivot), 5
    rank_sums = [0.0] * k
    ss_rank = 0.0
    for _, row in pivot.iterrows():
        mr = _midranks(row.tolist())
        ranks = [mr[v] for v in row.tolist()]
        # midranks of a within-row ranking must sum to k(k+1)/2
        assert sum(ranks) == pytest.approx(k * (k + 1) / 2)
        for g in range(k):
            rank_sums[g] += ranks[g]
            ss_rank += ranks[g] ** 2
    num = (k - 1) * sum((rg - n * (k + 1) / 2) ** 2 for rg in rank_sums)
    den = ss_rank - n * k * (k + 1) ** 2 / 4
    q = num / den
    for g in range(k):
        assert int(r[f"rr{g + 1}"]) == int(2 * rank_sums[g])
    assert int(r["ss_rank4"]) == int(4 * ss_rank)
    assert float(r["q_stat"]) == pytest.approx(q, rel=1e-9)


def test_friedman_no_tie_reduction():
    """With no ties the general form equals 12/(nk(k+1))ΣR² − 3n(k+1)."""
    import itertools
    import random

    rng = random.Random(7)
    k, n = 5, 40
    perms = [rng.sample(range(1, k + 1), k) for _ in range(n)]
    rank_sums = [sum(p[g] for p in perms) for g in range(k)]
    ss_rank = sum(x**2 for p in perms for x in p)
    num = (k - 1) * sum((rg - n * (k + 1) / 2) ** 2 for rg in rank_sums)
    den = ss_rank - n * k * (k + 1) ** 2 / 4
    classic = 12 / (n * k * (k + 1)) * sum(
        rg**2 for rg in rank_sums
    ) - 3 * n * (k + 1)
    assert num / den == pytest.approx(classic, rel=1e-12)


# ------------------------------------------------- readability


def test_readability_matches_python_re(spark):
    df = _run(spark, "doc_readability_scores").set_index("source")
    docs = t(spark, SF, "documents").select("source", "text").toPandas()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, sents, sylls
    for src, text in docs.itertuples(index=False):
        a = agg[src]
        a[0] += 1
        a[1] += len(re.findall(r"\S+", text))
        a[2] += max(len(re.findall(r"[.!?]+", text)), 1)
        a[3] += len(re.findall(r"[aeiouy]+", text.lower()))
    assert set(df.index) == set(agg)
    for src, (nd, w, s, sy) in agg.items():
        assert int(df.loc[src, "n_docs"]) == nd
        assert int(df.loc[src, "words"]) == w
        assert int(df.loc[src, "sentences"]) == s
        assert int(df.loc[src, "syllables"]) == sy
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
        assert float(df.loc[src, "flesch_ease"]) == pytest.approx(
            flesch, rel=1e-12
        )
        fk = 0.39 * (w / s) + 11.8 * (sy / w) - 15.59
        assert float(df.loc[src, "fk_grade"]) == pytest.approx(
            fk, rel=1e-12
        )
