"""Property gates for the round-9m blocking/index-planning batch
(plans/queries_r9m.py): an independent pure-Python Soundex-variant
implementation recomputes every blocking key, and hashlib md5 replays
the HNSW level coins; census counts must match exactly.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

_CODE = {}
for letters, d in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
    ("AEIOUYHW", "0"),
):
    for ch in letters:
        _CODE[ch] = d


def _soundex_variant(word: str) -> str:
    u = word.upper()
    m = "".join(_CODE[ch] for ch in u)
    # collapse adjacent duplicates (zeros included: vowel runs collapse,
    # and vowels BREAK consonant runs — the classic behavior)
    c = []
    for ch in m:
        if not c or c[-1] != ch:
            c.append(ch)
    z = "".join(ch for ch in c if ch != "0")
    r = z if m[:1] == "0" else z[1:]
    return u[:1] + (r + "000")[:3]


def test_soundex_blocking_census(spark):
    got = {
        r["blk"]: r
        for r in REGISTRY["rel_soundex_blocking"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    part = pd.read_parquet(f"{SF}/part.parquet")
    nouns = part["p_name"].str.split(" ").str[1]
    keys = nouns.map(_soundex_variant)
    want_n = Counter(keys)
    assert {k: int(v["n_parts"]) for k, v in got.items()} == dict(want_n)
    by_key_names = defaultdict(set)
    by_key_nouns = defaultdict(set)
    for name, noun, k in zip(part["p_name"], nouns, keys):
        by_key_names[k].add(name)
        by_key_nouns[k].add(noun)
    for k, row in got.items():
        n = want_n[k]
        assert int(row["n_names"]) == len(by_key_names[k])
        assert int(row["n_nouns"]) == len(by_key_nouns[k])
        assert int(row["cand_pairs"]) == n * (n - 1) // 2
    # blocking must actually reduce the pair space vs all-pairs
    total = len(part)
    assert sum(n * (n - 1) // 2 for n in want_n.values()) < (
        total * (total - 1) // 2
    )
    # spot-pin the variant on known words (hand-computed)
    assert _soundex_variant("widget") == "W323"
    assert _soundex_variant("bolt") == "B430"
    assert _soundex_variant("apple") == "A140"
    assert _soundex_variant("bob") == "B100"


def test_hnsw_level_plan_census(spark):
    rows = (
        REGISTRY["emb_hnsw_level_plan"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("level")
        .to_dict("records")
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    levels = []
    for vid in emb["vec_id"]:
        coin = int(
            hashlib.md5(f"{int(vid)}:hnsw".encode()).hexdigest()[:4], 16
        )
        lvl = 0
        for m in (16, 256, 4096, 65536):
            lvl += 1 if coin % m == 0 else 0
        levels.append(lvl)
    want = Counter(levels)
    got_at = {int(r["level"]): int(r["n_at_level"]) for r in rows}
    assert got_at == dict(want)
    n = len(levels)
    for r in rows:
        lv = int(r["level"])
        in_layer = sum(c for l2, c in want.items() if l2 >= lv)
        assert int(r["n_in_layer"]) == in_layer
        budget = 32 if lv == 0 else 16
        assert int(r["edge_budget"]) == budget
        assert int(r["edge_slots"]) == in_layer * budget
        assert int(r["adj_bytes"]) == in_layer * budget * 4
    # layer 0 holds every node; upper layers thin geometrically (~1/16)
    assert got_at.get(0, 0) >= n * 14 // 16
    if 1 in got_at:
        assert got_at[1] < n // 8
