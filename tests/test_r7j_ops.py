"""Property gates for round-7j: brute-force A-ES weighted sampling,
degree assortativity, and repurchase medians at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_priority_sample_matches_bruteforce(spark):
    got = sorted(
        (int(r["rnk"]), int(r["doc_id"]))
        for r in REGISTRY["doc_priority_sample"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet' "
        f"WHERE n_chars > 0"
    ).fetchall()
    pri = []
    for did, w in docs:
        h = hashlib.md5(f"aes:{did}".encode()).hexdigest()
        u = (int(h[:8], 16) + 1) / 4294967297.0
        pri.append((math.log(u) / w, -did))
    pri.sort(reverse=True)
    exp = sorted((i + 1, -nd) for i, (_, nd) in enumerate(pri[:25]))
    assert got == exp
    # weighting sanity: the weighted sample skews heavier than uniform
    wts = dict(docs)
    mean_sel = sum(wts[d] for _, d in got) / len(got)
    mean_all = sum(wts.values()) / len(wts)
    assert mean_sel > mean_all * 0.9


def test_assortativity_matches_bruteforce(spark):
    row = (
        REGISTRY["doc_dupgraph_assortativity"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_mapside,
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

    docs = t(spark, SF, "documents")
    sig = minhash_signatures_mapside(docs, n=3, num_hashes=8)
    pairs = [
        (int(r["id_a"]), int(r["id_b"]))
        for r in lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
        .toPandas()
        .to_dict("records")
    ]
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n, sx = len(xs), sum(xs)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert int(row["n_edge_ends"]) == n
    assert int(row["deg_sum"]) == sx
    assert int(row["deg_sq_sum"]) == sxx
    assert int(row["deg_prod_sum"]) == sxy
    exp = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert abs(float(row["assortativity"]) - exp) < 1e-12
    assert -1.0 - 1e-9 <= float(row["assortativity"]) <= 1.0 + 1e-9


def test_repurchase_intervals_match_bruteforce(spark):
    got = {
        r["segment"]: r
        for r in REGISTRY["rel_repurchase_intervals"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT c.c_mktsegment, o.o_custkey, CAST(o.o_orderdate AS DATE), "
        f"o.o_orderkey FROM '{SF}/orders.parquet' o "
        f"JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey"
    ).fetchall()
    per_cust = defaultdict(list)
    seg_of = {}
    for seg, ck, od, ok in rows:
        per_cust[ck].append((od, ok, seg))
    gaps = defaultdict(list)
    for ck, orders in per_cust.items():
        orders.sort()
        for (d1, _, _), (d2, _, seg2) in zip(orders, orders[1:]):
            gaps[seg2].append((d2 - d1).days)
    for seg, gs in gaps.items():
        a = sorted(gs)
        n = len(a)
        med2 = a[(n + 1) // 2 - 1] + a[(n + 2) // 2 - 1]
        row = got[seg]
        assert int(row["n_gaps"]) == n, seg
        assert int(row["median2_gap_d"]) == med2, seg
