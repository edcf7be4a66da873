"""Property gates for the round-7b statistics suite: brute-force each
statistic from the raw sf0.001 rows in plain Python (no Spark, no SQL)
and compare against the registered queries — including assembling the
Brown-Forsythe F from the emitted sufficient statistics (the artifact
cut) against a direct float reference."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, "
        f"CAST(round(value*100) AS BIGINT) AS v, value "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()


def test_mann_whitney_matches_bruteforce(spark):
    row = (
        REGISTRY["evt_mann_whitney_u"].spark_fn(spark, SF).toPandas().iloc[0]
    )
    xs = [v for _, _, _, et, v, val in _rows() if et == "view" and val is not None]
    ys = [
        v
        for _, _, _, et, v, val in _rows()
        if et == "purchase" and val is not None
    ]
    u2 = 0
    for x in xs:
        for y in ys:
            u2 += 2 if y < x else (1 if y == x else 0)
    assert int(row["n1"]) == len(xs)
    assert int(row["n2"]) == len(ys)
    assert int(row["u2"]) == u2
    from collections import Counter

    ties = Counter(xs) + Counter(ys)
    assert int(row["tie_term"]) == sum(t * (t * t - 1) for t in ties.values())
    exp_delta = (u2 - len(xs) * len(ys)) / (len(xs) * len(ys))
    assert abs(float(row["cliffs_delta"]) - exp_delta) < 1e-12
    assert -1.0 <= float(row["cliffs_delta"]) <= 1.0


def test_levene_median_stats_and_f_assembly(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_levene_median"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = defaultdict(list)
    for _, _, _, et, v, val in _rows():
        if val is not None:
            groups[et].append(v)
    zs = {}
    for et, vals in groups.items():
        a = sorted(vals)
        n = len(a)
        med2 = a[(n + 1) // 2 - 1] + a[(n + 2) // 2 - 1]
        z = [abs(2 * x - med2) for x in vals]
        zs[et] = z
        row = got[et]
        assert int(row["n"]) == n, et
        assert int(row["sz"]) == sum(z), et
        # qz rides as two BIGINT halves (no 128-bit output column)
        qz = int(row["qz_hi"]) * 1048576 + int(row["qz_lo"])
        assert qz == sum(x * x for x in z), et
    # artifact cut: assemble Brown-Forsythe F from the emitted stats and
    # compare with the direct float computation over raw z values
    N = sum(len(z) for z in zs.values())
    k = len(zs)
    sz_tot = sum(sum(z) for z in zs.values())
    between = sum(sum(z) ** 2 / len(z) for z in zs.values()) - sz_tot**2 / N
    within = sum(sum(x * x for x in z) for z in zs.values()) - sum(
        sum(z) ** 2 / len(z) for z in zs.values()
    )
    f_direct = ((N - k) * between) / ((k - 1) * within)
    f_from_rows = (
        (N - k)
        * (
            sum(
                int(r["sz"]) ** 2 / int(r["n"]) for r in got.values()
            )
            - sum(int(r["sz"]) for r in got.values()) ** 2 / N
        )
    ) / (
        (k - 1)
        * (
            sum(
                int(r["qz_hi"]) * 1048576 + int(r["qz_lo"])
                for r in got.values()
            )
            - sum(int(r["sz"]) ** 2 / int(r["n"]) for r in got.values())
        )
    )
    assert abs(f_direct - f_from_rows) < 1e-9 * max(1.0, abs(f_direct))
    assert f_direct >= 0


def test_durbin_watson_matches_bruteforce(spark):
    got = {
        (int(r["user_id"]), r["event_type"]): r
        for r in REGISTRY["evt_durbin_watson"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = defaultdict(list)
    for eid, ts, uid, et, v, val in _rows():
        if val is not None:
            series[(int(uid), et)].append((ts, eid, v))
    checked = 0
    for key, rows in series.items():
        rows.sort()
        vs = [v for _, _, v in rows]
        n = len(vs)
        s, q = sum(vs), sum(v * v for v in vs)
        den = n * q - s * s
        if n < 3 or den <= 0:
            assert key not in got
            continue
        num = sum((vs[i] - vs[i - 1]) ** 2 for i in range(1, n))
        row = got[key]
        assert int(row["n"]) == n
        assert int(row["dw_num"]) == num
        assert int(row["dw_den_n"]) == den
        assert abs(float(row["dw"]) - n * num / den) < 1e-12 * max(
            1.0, n * num / den
        )
        checked += 1
    assert checked == len(got) and checked > 0


def test_grubbs_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_grubbs_outlier"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = defaultdict(list)
    for eid, _, _, et, v, val in _rows():
        if val is not None:
            groups[et].append((int(eid), v))
    for et, rows in groups.items():
        n = len(rows)
        s = sum(v for _, v in rows)
        q = sum(v * v for _, v in rows)
        best = min(rows, key=lambda r: (-abs(n * r[1] - s), r[0]))
        dev = abs(n * best[1] - s)
        row = got[et]
        assert int(row["n"]) == n, et
        assert int(row["outlier_event_id"]) == best[0], et
        assert int(row["dev_n"]) == dev, et
        exp_g2 = (n - 1) * (float(dev) * float(dev)) / (n * float(n * q - s * s))
        assert abs(float(row["g2"]) - exp_g2) < 1e-9 * max(1.0, exp_g2), et
        # Grubbs G is bounded by (n-1)/sqrt(n)
        assert float(row["g2"]) <= (n - 1) ** 2 / n + 1e-9, et


def test_cochran_q_matches_bruteforce(spark):
    row = REGISTRY["evt_cochran_q"].spark_fn(spark, SF).toPandas().iloc[0]
    blocks = defaultdict(set)
    types = set()
    for _, ts, uid, et, _, _ in _rows():
        wk = dt.date(ts.year, ts.month, ts.day).isocalendar()[1]
        blocks[(int(uid), wk)].add(et)
        types.add(et)
    k = len(types)
    rvals = [len(s) for s in blocks.values()]
    cvals = [
        sum(1 for s in blocks.values() if t in s) for t in sorted(types)
    ]
    sum_r, sum_r2 = sum(rvals), sum(r * r for r in rvals)
    sum_c2 = sum(c * c for c in cvals)
    q_num = (k - 1) * (k * sum_c2 - sum_r * sum_r)
    q_den = k * sum_r - sum_r2
    assert int(row["k"]) == k
    assert int(row["n_blocks"]) == len(blocks)
    assert int(row["sum_r"]) == sum_r
    assert int(row["sum_r2"]) == sum_r2
    assert int(row["sum_c2"]) == sum_c2
    assert int(row["q_num"]) == q_num
    assert int(row["q_den"]) == q_den
    assert q_den > 0
    assert abs(float(row["q"]) - q_num / q_den) < 1e-12 * max(
        1.0, abs(q_num / q_den)
    )
