"""Property gates for round-7h: pivot cell semantics, running-records
counts vs brute force (and the harmonic-number null), Fano factor."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_pivot_matches_bruteforce_cells(spark):
    df = (
        REGISTRY["sql_pivot_monthly_status"].spark_fn(spark, SF).toPandas()
    )
    rows = duckdb.sql(
        f"SELECT date_trunc('month', o_orderdate), o_orderstatus, "
        f"CAST(round(o_totalprice*100) AS BIGINT) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    for mon, st, pc in rows:
        c = cells[(str(mon)[:10], st)]
        c[0] += pc
        c[1] += 1
    got = {str(r["month"])[:10]: r for r in df.to_dict("records")}
    months = {m for m, _ in cells}
    assert set(got) == months
    for mon in months:
        row = got[mon]
        for st, pre in (("O", "o"), ("F", "f"), ("P", "p")):
            if (mon, st) in cells:
                rev, n = cells[(mon, st)]
                assert int(row[f"{pre}_rev_c"]) == rev, (mon, st)
                assert int(row[f"{pre}_n"]) == n, (mon, st)
            else:
                # Spark pivots pre-aggregated cells: absent -> NULL
                assert row[f"{pre}_rev_c"] is None or row[f"{pre}_rev_c"] != row[f"{pre}_rev_c"], (mon, st)


def test_records_test_matches_bruteforce_and_harmonic(spark):
    got = {
        (int(r["user_id"]), r["event_type"]): r
        for r in REGISTRY["evt_records_test"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id, "
        f"CAST(round(value*100) AS BIGINT) FROM '{SF}/events.parquet' "
        f"WHERE value IS NOT NULL"
    ).fetchall()
    series = defaultdict(list)
    for uid, et, ts, eid, v in rows:
        series[(int(uid), et)].append((ts, eid, v))
    tot_records = tot_harmonic = 0.0
    n_series = 0
    for key, evs in series.items():
        evs.sort()
        best = None
        recs = 0
        for _, _, v in evs:
            if best is None or v > best:
                recs += 1
                best = v
        if len(evs) < 8:
            assert key not in got
            continue
        row = got[key]
        assert int(row["n"]) == len(evs), key
        assert int(row["n_records"]) == recs, key
        assert 1 <= recs <= len(evs), key
        tot_records += recs
        tot_harmonic += sum(1 / k for k in range(1, len(evs) + 1))
        n_series += 1
    # under exchangeability the records total concentrates near sum(H_n):
    # a loose 3x sanity band (the data is roughly exchangeable noise)
    assert n_series > 0
    assert tot_records < 3 * tot_harmonic


def test_fano_factor_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_fano_factor"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per_type = defaultdict(list)
    for et, _, c in rows:
        per_type[et].append(int(c))
    for et, cs in per_type.items():
        n, sc, sc2 = len(cs), sum(cs), sum(c * c for c in cs)
        row = got[et]
        assert int(row["n_days"]) == n, et
        assert int(row["sum_c"]) == sc, et
        assert int(row["sum_c2"]) == sc2, et
        exp = (n * sc2 - sc * sc) / (n * sc)
        assert abs(float(row["fano"]) - exp) < 1e-12 * max(1, exp), et
        assert float(row["fano"]) >= 0.0, et
