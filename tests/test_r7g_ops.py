"""Property gates for round-7g (experimentation ops): brute-force SRM,
power/MDE, frequency caps, and the conversion-window sweep from raw
rows in plain Python at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
ZA, ZB = 1.9599639845400545, 0.8416212335729143


def _rows():
    return duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id, epoch_us(ts) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()


def test_srm_check_matches_bruteforce(spark):
    row = REGISTRY["evt_srm_check"].spark_fn(spark, SF).toPandas().iloc[0]
    users = {int(u) for u, *_ in _rows()}
    na = nb = 0
    for u in users:
        h = hashlib.md5(f"exp42:{u}".encode()).hexdigest()
        if int(h[:8], 16) % 100 < 50:
            na += 1
        else:
            nb += 1
    assert int(row["na"]) == na and int(row["nb"]) == nb
    chi2 = (na - nb) ** 2 / (na + nb)
    assert abs(float(row["chi2"]) - chi2) < 1e-12
    assert int(row["srm_flag"]) == (1 if 1000 * (na - nb) ** 2 > 3841 * (na + nb) else 0)


def test_power_analysis_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_power_analysis"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    units = set()
    per_type = defaultdict(set)
    for u, et, ts, _, _ in _rows():
        d = (int(u), ts.date())
        units.add(d)
        per_type[et].add(d)
    n_total = len(units)
    for et, us in per_type.items():
        row = got[et]
        p = len(us) / n_total
        assert int(row["n_with"]) == len(us), et
        assert int(row["n_total"]) == n_total, et
        assert abs(float(row["p"]) - p) < 1e-12, et
        assert 0.0 < p < 1.0, et  # the (user,day) unit keeps p non-degenerate
        p2 = p * 1.1
        pbar = (p + p2) / 2
        root = ZA * math.sqrt(2 * pbar * (1 - pbar)) + ZB * math.sqrt(
            p * (1 - p) + p2 * (1 - p2)
        )
        n_req = root * root / ((p2 - p) ** 2)
        mde = (ZA + ZB) * math.sqrt(2 * p * (1 - p) / (n_total / 2))
        assert abs(float(row["n_required_per_arm"]) - n_req) < 1e-9 * n_req, et
        assert abs(float(row["mde_at_n"]) - mde) < 1e-12, et


def test_frequency_cap_sim_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_frequency_cap_sim"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    counts = defaultdict(int)
    for u, et, ts, _, _ in _rows():
        counts[(et, int(u), ts.date())] += 1
    per_type = defaultdict(list)
    for (et, _, _), n in counts.items():
        per_type[et].append(n)
    for et, ns in per_type.items():
        row = got[et]
        assert int(row["n_exposures"]) == sum(ns), et
        for k in (1, 2, 3, 5):
            assert int(row[f"kept_cap{k}"]) == sum(min(n, k) for n in ns), (et, k)
        supp = (sum(ns) - sum(min(n, 5) for n in ns)) / sum(ns)
        assert abs(float(row["suppressed_at_5"]) - supp) < 1e-12, et
        # caps are monotone
        assert (
            int(row["kept_cap1"]) <= int(row["kept_cap2"])
            <= int(row["kept_cap3"]) <= int(row["kept_cap5"])
            <= int(row["n_exposures"])
        ), et


def test_conversion_window_sweep_matches_bruteforce(spark):
    row = (
        REGISTRY["evt_conversion_window_sweep"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    per_user = defaultdict(list)
    for u, et, ts, eid, us in _rows():
        if et in ("view", "purchase"):
            per_user[int(u)].append((ts, eid, et, us))
    n_views = 0
    conv = {3600: 0, 21600: 0, 86400: 0}
    for evs in per_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        for i, (_, _, et, us) in enumerate(evs):
            if et != "view":
                continue
            n_views += 1
            nxt = [u2 for _, _, e2, u2 in evs[i + 1 :] if e2 == "purchase"]
            if not nxt:
                continue
            delta = min(nxt) - us
            for h in conv:
                if delta <= h * 1_000_000:
                    conv[h] += 1
    assert int(row["n_views"]) == n_views
    assert int(row["conv_1h"]) == conv[3600]
    assert int(row["conv_6h"]) == conv[21600]
    assert int(row["conv_24h"]) == conv[86400]
    assert conv[3600] <= conv[21600] <= conv[86400]
