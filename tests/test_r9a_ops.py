"""Property gates for the round-9a inequality/market-structure batch
(plans/queries_r9a.py): replay each statistic from raw parquet rows in
pure Python, and assemble the float indices (Theil T with its exact
within/between decomposition, Atkinson ε=1) from the emitted integer
sufficient statistics against a direct float reference.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000
_HALF = 1048576


def _pos_cents():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    out = defaultdict(list)
    for r in ev.itertuples():
        if r.value is None or pd.isna(r.value):
            continue
        v = int(round(float(r.value) * 100))
        if v >= 1:
            out[r.event_type].append(v)
    return out


def test_theil_stats_and_decomposition(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_theil_inequality"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = _pos_cents()
    assert set(got) == set(groups)
    tg = {}
    for et, vals in groups.items():
        n, s = len(vals), sum(vals)
        tnum = sum(v * round(math.log(v) * _LN_U) for v in vals)
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["s"]) == s
        assert int(row["tnum_hi"]) * _HALF + int(row["tnum_lo"]) == tnum
        # assembled Theil T vs direct float reference (quantization
        # error is bounded by 1e-6 ln units)
        t_assembled = tnum / (_LN_U * s) - math.log(s / n)
        mu = s / n
        t_direct = sum((v / mu) * math.log(v / mu) for v in vals) / n
        assert abs(t_assembled - t_direct) < 1e-5
        assert t_assembled >= -1e-5  # Theil T is non-negative
        tg[et] = (n, s, t_assembled)
    # exact decomposition: T_total = sum(S_g/S * T_g) + T_between
    N = sum(n for n, _, _ in tg.values())
    S = sum(s for _, s, _ in tg.values())
    within = sum((s / S) * t for _, s, t in tg.values())
    between = sum(
        (s / S) * math.log((s / S) / (n / N)) for n, s, _ in tg.values()
    )
    allvals = [v for vs in groups.values() for v in vs]
    mu = S / N
    t_total = sum((v / mu) * math.log(v / mu) for v in allvals) / N
    assert abs(t_total - (within + between)) < 1e-7


def test_atkinson_stats_and_index(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_atkinson_stats"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = _pos_cents()
    assert set(got) == set(groups)
    for et, vals in groups.items():
        n, s = len(vals), sum(vals)
        sum_ln = sum(round(math.log(v) * _LN_U) for v in vals)
        row = got[et]
        assert (int(row["n"]), int(row["s"]), int(row["sum_ln_u"])) == (
            n,
            s,
            sum_ln,
        )
        # assembled Atkinson(1) vs direct: A = 1 - GM/AM, in [0, 1)
        a = 1.0 - math.exp(sum_ln / n / _LN_U) / (s / n)
        gm = math.exp(sum(math.log(v) for v in vals) / n)
        assert abs(a - (1.0 - gm / (s / n))) < 1e-5
        assert -1e-6 <= a < 1.0


def test_herfindahl_matches_bruteforce(spark):
    got = {
        r["nation"]: r
        for r in REGISTRY["rel_herfindahl_market"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    nk_of = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    rev = defaultdict(int)
    for r in li.itertuples():
        rev[(nk_of[r.l_suppkey], r.l_suppkey)] += int(
            round(float(r.l_extendedprice) * 100)
        )
    by_nat = defaultdict(dict)
    for (nk, sk), c in rev.items():
        by_nat[nk][sk] = c
    for nk, sups in by_nat.items():
        tot = sum(sups.values())
        shares = {sk: (c * 10000) // tot for sk, c in sups.items()}
        order = sorted(sups, key=lambda sk: (-sups[sk], sk))
        row = got[name_of[nk]]
        assert int(row["n_suppliers"]) == len(sups)
        assert int(row["revenue_c"]) == tot
        assert int(row["hhi_bp"]) == (
            sum(s * s for s in shares.values()) // 10000
        )
        assert int(row["cr1_bp"]) == shares[order[0]]
        assert int(row["cr4_bp"]) == sum(shares[sk] for sk in order[:4])
        # CR1 <= CR4, HHI bounded by CR1-driven floor and 10000
        assert int(row["cr1_bp"]) <= int(row["cr4_bp"]) <= 10000
        assert 0 <= int(row["hhi_bp"]) <= 10000
