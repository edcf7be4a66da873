"""Property gates for round-7k: brute-force SimHash distance histogram
and Haar detail energies from raw rows at sf0.001."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict
from datetime import date

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _simhash16(text: str) -> int:
    toks = {
        t
        for t in re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        if t
    }
    votes = [0] * 16
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for b in range(16):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(16) if votes[b] > 0)


def test_simhash_distance_profile_matches_bruteforce(spark):
    got = {
        int(r["hamming"]): int(r["n_pairs"])
        for r in REGISTRY["doc_simhash_distance_profile"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_mapside,
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

    docs_df = t(spark, SF, "documents")
    sig = minhash_signatures_mapside(docs_df, n=3, num_hashes=8)
    pairs = [
        (int(r["id_a"]), int(r["id_b"]))
        for r in lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
        .toPandas()
        .to_dict("records")
    ]
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    sh = {d: _simhash16(txt) for d, txt in texts.items()}
    exp = Counter(bin(sh[a] ^ sh[b]).count("1") for a, b in pairs)
    assert got == dict(exp)
    assert all(0 <= h <= 16 for h in got)


def test_haar_energy_matches_bruteforce(spark):
    got = {
        (r["event_type"], int(r["level"])): r
        for r in REGISTRY["evt_haar_energy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), "
        f"CAST(round(value*100) AS BIGINT) FROM '{SF}/events.parquet' "
        f"WHERE value IS NOT NULL"
    ).fetchall()
    daily = defaultdict(int)
    for et, d, v in rows:
        daily[(et, (d - date(2024, 1, 1)).days)] += v
    types = {et for et, _ in daily}
    for et in types:
        for level in (1, 2, 3):
            size = 1 << level
            half = 1 << (level - 1)
            blocks = defaultdict(int)
            for (e, day), x in daily.items():
                if e != et:
                    continue
                blocks[day // size] += x if (day % size) < half else -x
            energy = sum(d * d for d in blocks.values())
            row = got[(et, level)]
            assert int(row["n_blocks"]) == len(blocks), (et, level)
            assert int(row["energy"]) == energy, (et, level)
    # Parseval-flavored sanity: total energy across levels is positive
    assert all(int(r["energy"]) >= 0 for r in got.values())
