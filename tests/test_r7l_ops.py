"""Property gates for round-7l: token-shape counts and weekday/weekend
lift brute-forced from raw rows at sf0.001."""

from __future__ import annotations

import re
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_token_shape_profile_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_token_shape_profile"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, text in docs:
        for tk in re.sub(r"\s+", " ", text.strip().lower()).split(" "):
            if not tk:
                continue
            a = agg[src]
            a[0] += 1
            a[1] += 1 if re.search(r"[0-9]", tk) else 0
            a[2] += 1 if len(tk) > 20 else 0
            a[3] += 1 if re.search(r"[^a-z0-9]", tk) else 0
    assert set(got) == set(agg)
    for src, (n, num, lng, sym) in agg.items():
        row = got[src]
        assert int(row["n_tokens"]) == n, src
        assert int(row["n_numeric"]) == num, src
        assert int(row["n_overlong"]) == lng, src
        assert int(row["n_symbol"]) == sym, src
        assert abs(float(row["numeric_frac"]) - num / n) < 1e-12, src


def test_weekday_weekend_lift_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_weekday_weekend_lift"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), "
        f"CAST(round(value*100) AS BIGINT) FROM '{SF}/events.parquet' "
        f"WHERE value IS NOT NULL"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for et, d, v in rows:
        we = d.isoweekday() in (6, 7)
        a = agg[et]
        if we:
            a[1] += 1
            a[3] += v
        else:
            a[0] += 1
            a[2] += v
    for et, (nwd, nwe, swd, swe) in agg.items():
        row = got[et]
        assert int(row["n_weekday"]) == nwd, et
        assert int(row["n_weekend"]) == nwe, et
        assert int(row["sum_weekday_c"]) == swd, et
        assert int(row["sum_weekend_c"]) == swe, et
        exp = (swe * nwd) / (swd * nwe)
        assert abs(float(row["weekend_lift"]) - exp) < 1e-12 * max(1, exp), et
        assert float(row["weekend_lift"]) > 0, et
