"""Property gates for the round-7d operational-analytics suite:
brute-force greedy knapsack, Wilson bounds, DAU/MAU, and the inventory
policy from raw rows in plain Python at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_knapsack_greedy_matches_bruteforce(spark):
    got = {
        r["p_brand"]: r
        for r in REGISTRY["rel_knapsack_greedy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    parts = duckdb.sql(
        f"SELECT p_brand, p_partkey, p_size, "
        f"CAST(round(p_retailprice*100) AS BIGINT) AS price_c "
        f"FROM '{SF}/part.parquet' WHERE p_size > 0"
    ).fetchall()
    by_brand = defaultdict(list)
    for b, pk, sz, pc in parts:
        by_brand[b].append((pc / sz, pk, sz, pc))
    for b, rows in by_brand.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        cum = n = tot_s = tot_v = 0
        for _, _, sz, pc in rows:
            cum += sz
            if cum > 100:
                break
            n += 1
            tot_s += sz
            tot_v += pc
        if n == 0:
            assert b not in got
            continue
        row = got[b]
        assert int(row["n_selected"]) == n, b
        assert int(row["total_size"]) == tot_s, b
        assert int(row["total_value_c"]) == tot_v, b
        assert int(row["total_size"]) <= 100, b


def test_wilson_ranking_matches_bruteforce(spark):
    df = (
        REGISTRY["rel_wilson_ranking"].spark_fn(spark, SF).toPandas()
    )
    rows = duckdb.sql(
        f"SELECT p.p_brand, count(*), "
        f"sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) "
        f"FROM '{SF}/lineitem.parquet' l "
        f"JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey "
        f"GROUP BY p.p_brand"
    ).fetchall()
    z = 1.9599639845400545
    exp = {}
    for b, n, pos in rows:
        p = pos / n
        lb = (p + z * z / (2 * n) - z * math.sqrt(
            (p * (1 - p) + z * z / (4 * n)) / n
        )) / (1 + z * z / n)
        exp[b] = (int(n), int(pos), lb)
    got = {r["p_brand"]: r for r in df.to_dict("records")}
    assert set(got) == set(exp)
    for b, (n, pos, lb) in exp.items():
        row = got[b]
        assert int(row["n"]) == n and int(row["pos"]) == pos, b
        assert abs(float(row["wilson_lb"]) - lb) < 1e-12, b
        # the bound is below the point estimate and within [0, 1]
        assert 0.0 <= float(row["wilson_lb"]) <= pos / n, b
    order = sorted(exp, key=lambda b: (-exp[b][2], b))
    got_order = [r["p_brand"] for r in sorted(df.to_dict("records"), key=lambda r: r["rnk"])]
    assert got_order == order


def test_dau_mau_matches_bruteforce(spark):
    got = {
        str(r["mon"]): r
        for r in REGISTRY["evt_dau_mau"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    days = defaultdict(set)
    months = defaultdict(set)
    for d, u in rows:
        days[d].add(u)
        months[d.replace(day=1)].add(u)
    per_mon = defaultdict(lambda: [0, 0])
    for d, us in days.items():
        m = per_mon[d.replace(day=1)]
        m[0] += 1
        m[1] += len(us)
    assert set(got) == {str(m) for m in months}
    for mon, us in months.items():
        nd, sdau = per_mon[mon]
        row = got[str(mon)]
        assert int(row["n_days"]) == nd
        assert int(row["sum_dau"]) == sdau
        assert int(row["mau"]) == len(us)
        exp = sdau / (nd * len(us))
        assert abs(float(row["stickiness"]) - exp) < 1e-12
        assert 0.0 < float(row["stickiness"]) <= 1.0


def test_inventory_policy_matches_bruteforce(spark):
    got = {
        r["p_brand"]: r
        for r in REGISTRY["rel_inventory_policy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT p.p_brand, CAST(l.l_shipdate AS DATE), "
        f"CAST(round(l.l_quantity) AS BIGINT) "
        f"FROM '{SF}/lineitem.parquet' l "
        f"JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    daily = defaultdict(int)
    for b, d, q in rows:
        daily[(b, d)] += q
    per_brand = defaultdict(list)
    for (b, _), q in daily.items():
        per_brand[b].append(q)
    for b, ds in per_brand.items():
        n, sd, sd2 = len(ds), sum(ds), sum(q * q for q in ds)
        row = got[b]
        assert int(row["n_days"]) == n, b
        assert int(row["sum_d"]) == sd, b
        assert int(row["sum_d2"]) == sd2, b
        eoq = math.sqrt(2 * 100 * sd / 2)
        var = (n * sd2 - sd * sd) / (n * n)
        rop = 7 * sd / n + 1.6448536269514722 * math.sqrt(7 * var)
        assert abs(float(row["eoq"]) - eoq) < 1e-9 * max(1, eoq), b
        assert abs(float(row["reorder_point"]) - rop) < 1e-9 * max(1, rop), b
        # safety stock is nonnegative: ROP >= lead-time mean demand
        assert float(row["reorder_point"]) >= 7 * sd / n - 1e-9, b
