"""Property gate for the round-9v watermark-detection batch
(plans/queries_r9v.py): hashlib replays every adjacent-pair green test;
on the unwatermarked fixture corpus the per-source green fraction must
sit inside tight binomial bands around 1/2 (the detector's
false-positive behavior).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _green(prev: str, cur: str) -> bool:
    h = hashlib.md5(f"wm:{prev}:{cur}".encode()).hexdigest()[:4]
    return int(h, 16) % 2 == 0


def test_watermark_greenlist_counts_and_null_behavior(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_watermark_greenlist"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, pairs, green, majority
    for r in docs.itertuples():
        ws = r.text.split(" ")
        if len(ws) < 2:
            continue
        pairs = len(ws) - 1
        green = sum(
            1 for a, b in zip(ws, ws[1:]) if _green(a, b)
        )
        a = agg[r.source]
        a[0] += 1
        a[1] += pairs
        a[2] += green
        a[3] += 1 if 2 * green > pairs else 0
    assert set(got) == set(agg)
    for src, (nd, np_, ng, nm) in agg.items():
        row = got[src]
        assert int(row["n_docs"]) == nd
        assert int(row["n_pairs"]) == np_, src
        assert int(row["n_green"]) == ng, src
        assert int(row["n_docs_green_majority"]) == nm, src
        # null behavior: unwatermarked corpus => green fraction ~ 1/2;
        # z-test with generous +-5 sigma band (md5 parity is fair)
        z = (ng - np_ / 2.0) / math.sqrt(np_ / 4.0)
        assert abs(z) < 5.0, (src, z)
        # majority-doc count near half the docs, loose binomial band
        assert abs(nm - nd / 2.0) <= 5.0 * math.sqrt(nd / 4.0) + 1
