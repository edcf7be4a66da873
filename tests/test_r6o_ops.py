"""Property gates for the round-6o multimodal curation operators."""

from __future__ import annotations

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def test_resolution_buckets_conserve_and_bound_waste(spark):
    df = _run(spark, "mm_resolution_buckets")
    docs = t(spark, SF, "documents").toPandas()
    n_images = (docs["doc_id"] % 3 == 0).sum()
    assert int(df["n_assets"].sum()) == n_images
    # waste is a proper fraction and zero for singleton-uniform buckets
    assert df["pad_waste_bp"].between(0, 9999).all()
    for _, r in df.iterrows():
        # pixels never exceed the padded envelope
        assert int(r["pixels"]) <= int(
            r["n_assets"] * r["max_w"] * r["max_h"]
        )
        if r["n_assets"] == 1:
            assert int(r["pad_waste_bp"]) == 0
    # stub width/height bounds
    assert df["max_w"].between(64, 575).all()
    assert df["max_h"].between(64, 575).all()


def test_resolution_buckets_aspect_classes_exact(spark):
    df = _run(spark, "mm_resolution_buckets")
    docs = t(spark, SF, "documents").toPandas()
    imgs = docs[docs["doc_id"] % 3 == 0]
    from collections import Counter

    want = Counter()
    for text in imgs["text"]:
        n = len(text.encode("utf-8"))
        w, h = 64 + n % 512, 64 + (n // 7) % 512
        aspect = (
            "wide" if 3 * w >= 4 * h
            else "tall" if 3 * h >= 4 * w
            else "square"
        )
        want[(aspect, (w * h) // 100000)] += 1
    got = {
        (r["aspect"], int(r["mp_band"])): int(r["n_assets"])
        for _, r in df.iterrows()
    }
    assert got == dict(want)


def test_modality_mix_plan_budget_math(spark):
    df = _run(spark, "mm_modality_mix_plan").set_index("media_type")
    docs = t(spark, SF, "documents").toPandas()
    total = len(docs)
    budget = total // 2
    mix = {"image": 50, "audio": 30, "video": 20}
    mod_of = {0: "image", 1: "audio", 2: "video"}
    counts = docs.groupby(docs["doc_id"] % 3).size()
    for rem, mt in mod_of.items():
        n = int(counts.get(rem, 0))
        quota = budget * mix[mt] // 100
        r = df.loc[mt]
        assert int(r["n_assets"]) == n
        assert int(r["quota"]) == quota
        assert int(r["accept_bp"]) == min(10000, quota * 10000 // n)
        assert int(r["shortfall"]) == max(quota - n, 0)
    # quotas never exceed the budget in total
    assert int(df["quota"].sum()) <= budget
    # bytes are the utf-8 payload lengths
    want_bytes = docs.groupby(docs["doc_id"] % 3)["text"].apply(
        lambda s: sum(len(x.encode("utf-8")) for x in s)
    )
    for rem, mt in mod_of.items():
        assert int(df.loc[mt, "n_bytes"]) == int(want_bytes[rem])
