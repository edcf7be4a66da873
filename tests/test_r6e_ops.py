"""Property gates for the round-6e operators (plans/queries_r6e.py).

Each statistic is recomputed from raw rows in Python (floats where the
textbook formula is float) and compared — pinning the algorithm, not
just engine==oracle agreement.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
    t,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


# ------------------------------------------------- log-rank


def _surv_rows(spark):
    ev = keyed_events(spark, SF).toPandas()
    ev["day"] = ev["ts"].dt.normalize()
    out = []
    for uid, g in ev.groupby("user_id"):
        d0 = g["day"].min()
        err = g.loc[g["event_type"] == "error", "day"]
        if len(err):
            out.append((uid % 2, (err.min() - d0).days, True))
        else:
            out.append((uid % 2, (g["day"].max() - d0).days, False))
    return out


def test_logrank_table_matches_bruteforce(spark):
    table = _run(spark, "evt_logrank_table").set_index("t_day")
    surv = _surv_rows(spark)
    times = sorted({tt for _, tt, died in surv if died})
    assert set(table.index) == set(times)
    for tt in times:
        n1 = sum(1 for a, x, _ in surv if a == 0 and x >= tt)
        n2 = sum(1 for a, x, _ in surv if a == 1 and x >= tt)
        d1 = sum(1 for a, x, dd in surv if a == 0 and x == tt and dd)
        d2 = sum(1 for a, x, dd in surv if a == 1 and x == tt and dd)
        assert int(table.loc[tt, "at_risk_1"]) == n1, tt
        assert int(table.loc[tt, "at_risk_2"]) == n2, tt
        assert int(table.loc[tt, "deaths_1"]) == d1, tt
        assert int(table.loc[tt, "deaths_2"]) == d2, tt


def test_logrank_z_is_assemblable_and_sane(spark):
    """The consumer-side statistic: A/A arms should not be wildly
    significant (|z| < 5)."""
    table = _run(spark, "evt_logrank_table")
    o_minus_e, var = 0.0, 0.0
    for _, r in table.iterrows():
        n1, n2 = int(r["at_risk_1"]), int(r["at_risk_2"])
        d1, d2 = int(r["deaths_1"]), int(r["deaths_2"])
        n, d = n1 + n2, d1 + d2
        o_minus_e += d1 - d * n1 / n
        if n > 1:
            var += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    assert var > 0
    assert abs(o_minus_e / math.sqrt(var)) < 5.0


# ------------------------------------------------- waterfill


def _waterfill_bruteforce(demands, cap):
    """Reference implementation: raise the integer level until the
    budget is exhausted, remainder to the lowest-(demand, key) rationed
    parts."""
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    alloc = {}
    # full-service prefix
    pref = 0
    k = 0
    for i, (pk, d) in enumerate(items, start=1):
        if (pref) + d * (n - i + 1) <= cap:
            k = i
            pref += d
        else:
            break
    for pk, d in items[:k]:
        alloc[pk] = d
    rest = items[k:]
    if rest:
        level = (cap - pref) // len(rest)
        rem = (cap - pref) % len(rest)
        for j, (pk, d) in enumerate(rest):
            alloc[pk] = level + (1 if j < rem else 0)
    return alloc, k


def test_waterfill_matches_bruteforce_and_conserves(spark):
    df = _run(spark, "rel_waterfill_allocation")
    r = df.iloc[0]
    li = t(spark, SF, "lineitem").toPandas()
    demands = {
        int(pk): int(q)
        for pk, q in li.groupby("l_partkey")["l_quantity"]
        .sum()
        .round()
        .items()
    }
    total = sum(demands.values())
    cap = total // 2
    assert int(r["total_demand"]) == total
    assert int(r["cap"]) == cap
    alloc, k = _waterfill_bruteforce(demands, cap)
    assert int(r["n_full"]) == k
    assert int(r["total_allocated"]) == sum(alloc.values()) == cap
    # every allocation is min(demand, level(+1)) and <= demand
    assert all(alloc[pk] <= demands[pk] for pk in alloc)
    n_rationed = len(demands) - k
    if n_rationed:
        level = int(r["level"])
        assert int(r["remainder"]) == (cap - sum(
            sorted(demands.values())[:k]
        )) % n_rationed
        # max-min fairness: rationed parts differ by at most one unit
        got = {
            alloc[pk]
            for pk, d in demands.items()
            if d > level + 1
        }
        assert got <= {level, level + 1}


# ------------------------------------------------- ANOVA


def test_anova_matches_float_reference(spark):
    df = _run(spark, "evt_anova_oneway")
    r = df.iloc[0]
    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    rows = ev.select("event_type", "value_c").toPandas()
    groups = {
        et: g["value_c"].astype(float).tolist()
        for et, g in rows.groupby("event_type")
    }
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    sst = sum((x - grand) ** 2 for v in groups.values() for x in v)
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert int(r["k_groups"]) == k
    assert int(r["n"]) == n
    assert float(r["ss_between"]) == pytest.approx(ssb, rel=1e-9)
    assert float(r["ss_within"]) == pytest.approx(ssw, rel=1e-9)
    assert float(r["f_stat"]) == pytest.approx(f, rel=1e-9)


# ------------------------------------------------- Cronbach


def test_cronbach_matches_float_reference(spark):
    df = _run(spark, "evt_cronbach_alpha")
    r = df.iloc[0]
    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    rows = ev.select("user_id", "event_type", "value_c").toPandas()
    types = ["click", "error", "purchase", "signup", "view"]
    pivot = (
        rows.pivot_table(
            index="user_id",
            columns="event_type",
            values="value_c",
            aggfunc="sum",
            fill_value=0,
        )
        .reindex(columns=types, fill_value=0)
        .astype(float)
    )
    n = len(pivot)
    item_vars = pivot.var(axis=0, ddof=0)
    total_var = pivot.sum(axis=1).var(ddof=0)
    alpha = (5 / 4) * (1 - item_vars.sum() / total_var)
    assert int(r["n_users"]) == n
    assert float(r["alpha"]) == pytest.approx(alpha, rel=1e-9)
    # integer numerators scale by n^2
    assert float(r["item_var_num_d"]) == pytest.approx(
        item_vars.sum() * n * n, rel=1e-9
    )
    assert float(r["total_var_num_d"]) == pytest.approx(
        total_var * n * n, rel=1e-9
    )
