"""Property gates for the round-7c corpus-linguistics suite: brute-force
each statistic from the raw document text in plain Python and compare
against the registered queries at sf0.001."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()


def _toks(text: str):
    return [
        t
        for t in re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        if t
    ]


def test_hapax_ratio_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_hapax_ratio"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    per_src = defaultdict(Counter)
    for _, src, text in _docs():
        per_src[src].update(_toks(text))
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        row = got[src]
        hapax = sum(1 for c in cnt.values() if c == 1)
        assert int(row["n_tokens"]) == sum(cnt.values()), src
        assert int(row["vocab"]) == len(cnt), src
        assert int(row["hapax"]) == hapax, src
        assert abs(float(row["hapax_frac"]) - hapax / len(cnt)) < 1e-12, src


def test_heaps_law_matches_bruteforce_and_is_monotone(spark):
    got = {
        int(r["bucket"]): r
        for r in REGISTRY["doc_heaps_law"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    first = {}
    btok = Counter()
    for did, _, text in sorted(_docs()):
        toks = _toks(text)
        btok[did // 50] += len(toks)
        for t in toks:
            first.setdefault(t, did)
    bnew = Counter(fd // 50 for fd in first.values())
    cum_t = cum_v = 0
    for b in sorted(set(btok) | set(bnew)):
        cum_t += btok.get(b, 0)
        cum_v += bnew.get(b, 0)
        row = got[b]
        assert int(row["n_tokens"]) == btok.get(b, 0), b
        assert int(row["new_vocab"]) == bnew.get(b, 0), b
        assert int(row["cum_tokens"]) == cum_t, b
        assert int(row["cum_vocab"]) == cum_v, b
    # Heaps: vocabulary never exceeds token mass, both monotone
    assert all(
        int(r["cum_vocab"]) <= int(r["cum_tokens"]) for r in got.values()
    )


def test_simpson_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_simpson_diversity"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    per_src = defaultdict(Counter)
    for _, src, text in _docs():
        per_src[src].update(_toks(text))
    for src, cnt in per_src.items():
        row = got[src]
        n = sum(cnt.values())
        rep = sum(c * (c - 1) for c in cnt.values())
        assert int(row["n_tokens"]) == n, src
        assert int(row["rep_pairs"]) == rep, src
        exp_d = rep / (n * (n - 1))
        assert abs(float(row["simpson_d"]) - exp_d) < 1e-12, src
        assert 0.0 <= float(row["simpson_d"]) <= 1.0, src


def test_ttr_chunks_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_ttr_chunks"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    agg = defaultdict(lambda: [0, 0])  # n_chunks, sum_types
    for _, src, text in _docs():
        # positions over the RAW split (empties keep their slot, are
        # dropped after) — mirrors the engine's positional explode
        raw = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        chunks = defaultdict(list)
        for i, tk in enumerate(raw):
            if tk:
                chunks[i // 50].append(tk)
        for toks in chunks.values():
            if len(toks) == 50:
                agg[src][0] += 1
                agg[src][1] += len(set(toks))
    assert set(got) == set(agg)
    for src, (nc, st) in agg.items():
        row = got[src]
        assert int(row["n_chunks"]) == nc, src
        assert int(row["sum_types"]) == st, src
        assert abs(float(row["mean_ttr"]) - st / (50 * nc)) < 1e-12, src
        assert 0.0 < float(row["mean_ttr"]) <= 1.0, src
