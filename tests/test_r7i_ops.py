"""Property gates for round-7i: bullwhip ratio, OTIF fill, and
inter-arrival CV brute-forced from raw rows at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _cv2(xs):
    n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
    return (n * q - s * s) / (s * s)


def test_bullwhip_matches_bruteforce(spark):
    row = REGISTRY["rel_bullwhip_ratio"].spark_fn(spark, SF).toPandas().iloc[0]
    om = defaultdict(int)
    for (m,) in duckdb.sql(
        f"SELECT date_trunc('month', o_orderdate) FROM '{SF}/orders.parquet'"
    ).fetchall():
        om[m] += 1
    sm = defaultdict(int)
    for m, q in duckdb.sql(
        f"SELECT date_trunc('month', l_shipdate), "
        f"CAST(round(l_quantity) AS BIGINT) FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        sm[m] += q
    assert int(row["order_months"]) == len(om)
    assert int(row["ship_months"]) == len(sm)
    assert int(row["orders_total"]) == sum(om.values())
    assert int(row["shipped_total"]) == sum(sm.values())
    exp = _cv2(list(om.values())) / _cv2(list(sm.values()))
    assert abs(float(row["bullwhip"]) - exp) < 1e-9 * max(1, exp)
    assert float(row["bullwhip"]) > 0


def test_otif_matches_bruteforce(spark):
    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["rel_otif_fill"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT o.o_orderkey, o.o_orderpriority, "
        f"date_diff('day', CAST(o.o_orderdate AS DATE), "
        f"CAST(l.l_shipdate AS DATE)) "
        f"FROM '{SF}/orders.parquet' o "
        f"JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    per_order = defaultdict(lambda: [None, 0, None])
    for ok, pri, lag in rows:
        rec = per_order[ok]
        rec[0] = pri
        rec[1] += 1
        rec[2] = lag if rec[2] is None else max(rec[2], lag)
    agg = defaultdict(lambda: [0, 0, 0])
    for pri, n_lines, worst in per_order.values():
        a = agg[pri]
        a[0] += 1
        a[1] += 1 if worst <= 90 else 0
        a[2] += n_lines
    assert set(got) == set(agg)
    for pri, (n, otif, nl) in agg.items():
        row = got[pri]
        assert int(row["n_orders"]) == n, pri
        assert int(row["n_otif_90d"]) == otif, pri
        assert int(row["n_lines"]) == nl, pri
        assert abs(float(row["otif_rate"]) - otif / n) < 1e-12, pri


def test_interarrival_cv_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_interarrival_cv"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT event_type, ts, event_id, epoch_us(ts) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    per_type = defaultdict(list)
    for et, ts, eid, us in rows:
        per_type[et].append((ts, eid, us))
    for et, evs in per_type.items():
        evs.sort()
        gaps = [b[2] - a[2] for a, b in zip(evs, evs[1:])]
        if sum(gaps) <= 0:
            assert et not in got
            continue
        row = got[et]
        assert int(row["n_gaps"]) == len(gaps), et
        assert int(row["gap_sum_us"]) == sum(gaps), et
        assert abs(float(row["cv2"]) - _cv2(gaps)) < 1e-9, et
        assert float(row["cv2"]) >= 0.0, et
