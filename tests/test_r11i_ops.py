"""Property gates for the round-11i batch: triplet-construction laws —
positives share the anchor's block, negatives never do, and the
construction is a deterministic function of the corpus.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _blocks(SF):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    blk = {}
    for r in docs.itertuples():
        nt = re.sub(r"\s+", " ", r.text.strip().lower())
        blk[int(r.doc_id)] = hashlib.md5(nt[:40].encode()).hexdigest()
    return blk


def test_triplet_laws(spark):
    rows = (
        REGISTRY["doc_contrastive_triplets"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows, "prefix blocks with >1 member must exist in the fixture"
    blk = _blocks(SF)
    anchors = set()
    for r in rows:
        a, p, n = (
            int(r["anchor_id"]),
            int(r["positive_id"]),
            int(r["negative_id"]),
        )
        assert len({a, p, n}) == 3, "triplet members are distinct docs"
        assert blk[a] == blk[p], "positive shares the anchor's block"
        assert blk[a] != blk[n], "negative is from a different block"
        assert p > a, "positive is the block successor in doc_id order"
        assert a not in anchors, "one triplet per anchor"
        anchors.add(a)
    # every multi-member block contributes size-1 triplets (each
    # non-last member anchors one), minus the rare both-neighbors-
    # same-block drops — which this fixture must not hit
    by_blk: dict[str, int] = {}
    for b in blk.values():
        by_blk[b] = by_blk.get(b, 0) + 1
    expected = sum(c - 1 for c in by_blk.values() if c > 1)
    assert len(rows) == expected


def test_triplets_are_deterministic(spark):
    df1 = (
        REGISTRY["doc_contrastive_triplets"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("anchor_id")
        .reset_index(drop=True)
    )
    df2 = (
        REGISTRY["doc_contrastive_triplets"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("anchor_id")
        .reset_index(drop=True)
    )
    assert df1.equals(df2)
