"""Property gates for the round-6d operators (plans/queries_r6d.py).

The load-bearing one is Lindley: the closed form (prefix sum + running
min) must equal the textbook per-row recurrence exactly — verified
against a brute-force Python loop on real data.  The others pin
statistic identities both engines could get wrong together.
"""

from __future__ import annotations

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


# ------------------------------------------------- Lindley closed form


def test_lindley_matches_recurrence_loop(spark):
    out = _run(spark, "evt_queue_wait_lindley").set_index("user_id")
    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    rows = (
        ev.select(
            "user_id", "event_id",
            F.unix_micros("ts").alias("t"),
            ((F.abs(F.col("value_c")) % 600 + 1) * 1000000).alias("svc"),
        )
        .toPandas()
    )
    for uid, grp in rows.groupby("user_id"):
        jobs = grp.sort_values(["t", "event_id"]).reset_index(drop=True)
        w, total, mx, delayed = 0, 0, 0, 0
        for i in range(len(jobs)):
            if i == 0:
                w = 0
            else:
                a = int(jobs.loc[i, "t"]) - int(jobs.loc[i - 1, "t"])
                w = max(0, w + int(jobs.loc[i - 1, "svc"]) - a)
            total += w
            mx = max(mx, w)
            delayed += 1 if w > 0 else 0
        assert int(out.loc[uid, "n_jobs"]) == len(jobs)
        assert int(out.loc[uid, "total_wait_us"]) == total, uid
        assert int(out.loc[uid, "max_wait_us"]) == mx, uid
        assert int(out.loc[uid, "n_delayed"]) == delayed, uid


# ------------------------------------------------- Mann-Kendall


def test_mann_kendall_matches_bruteforce(spark):
    df = _run(spark, "evt_mann_kendall")
    assert len(df) == 1
    r = df.iloc[0]
    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value_c").alias("s"))
        .toPandas()
        .sort_values("day")["s"]
        .tolist()
    )
    n = len(daily)
    s = sum(
        (0 < daily[j] - daily[i]) - (daily[j] - daily[i] < 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert int(r["n_days"]) == n
    assert int(r["s_stat"]) == s
    from collections import Counter

    tie = sum(
        c * (c - 1) * (2 * c + 5)
        for c in Counter(daily).values()
        if c > 1
    )
    vn = n * (n - 1) * (2 * n + 5) - tie
    assert int(r["var_num"]) == vn
    import math

    want_z = (
        (s - 1) / math.sqrt(vn / 18.0)
        if s > 0
        else ((s + 1) / math.sqrt(vn / 18.0) if s < 0 else 0.0)
    )
    assert float(r["z"]) == pytest.approx(want_z, rel=1e-12)


# ------------------------------------------------- runs test


def test_runs_test_counts_consistent(spark):
    df = _run(spark, "evt_runs_test")
    r = df.iloc[0]
    a, b, runs = int(r["n_above"]), int(r["n_below"]), int(r["n_runs"])
    # above/below of an interpolated median differ by at most the
    # number of dropped ties; runs bounded by the sequence length.
    assert 1 <= runs <= a + b
    assert a > 0 and b > 0
    assert float(r["expected_runs"]) == pytest.approx(
        1 + 2 * a * b / (a + b), rel=1e-12
    )


# ------------------------------------------------- permutation test


def test_permutation_test_pvalue_bounds_and_split(spark):
    df = _run(spark, "evt_permutation_test")
    r = df.iloc[0]
    K = int(r["n_perms"])
    ge = int(r["ge_count"])
    assert 0 <= ge <= K
    assert int(r["p_bp"]) == (1 + ge) * 10000 // (K + 1)
    # the md5 split is unbiased: each permutation's group-A share is
    # near half (binomial; 6 sigma at n>=1000)
    assert int(r["n_a"]) < int(r["n"])


def test_permutation_labels_are_half_split(spark):
    """Bit k of md5(event_id) is an unbiased coin (checked for k=0 and
    k=63, the two ends of the digest)."""
    import math

    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    n = ev.count()
    h = F.md5(F.col("event_id").cast("string"))
    for k in (0, 63):
        in_a = F.expr(
            f"(shiftright(instr('0123456789abcdef', substring("
            f"md5(cast(event_id as string)), {1 + k // 4}, 1)) - 1,"
            f" {k % 4}) & 1) = 1"
        )
        na = ev.filter(in_a).count()
        assert abs(na - n / 2) < 6 * math.sqrt(n) / 2 + 1, k


# ------------------------------------------------- inventory fill


def test_inventory_fill_conserves_and_brute_forces(spark):
    df = _run(spark, "rel_inventory_fill")
    li = t(spark, SF, "lineitem").select(
        "l_partkey", "l_quantity", "l_shipdate", "l_orderkey",
        "l_linenumber",
    ).toPandas()
    part = t(spark, SF, "part").select("p_partkey", "p_size").toPandas()
    cap = {int(p): int(s) * 20 for p, s in part.itertuples(index=False)}
    total_demand = int(round(li["l_quantity"].sum()))
    assert int(df["demand_units"].sum()) == total_demand
    assert int(df["n_parts"].sum()) == li["l_partkey"].nunique()
    # brute force the FCFS fill
    filled_total = 0
    for pk, grp in li.groupby("l_partkey"):
        c = cap[int(pk)]
        left = c
        for q in grp.sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"]
        )["l_quantity"]:
            take = min(int(round(q)), max(0, left))
            filled_total += take
            left -= int(round(q))
    assert int(df["filled_units"].sum()) == filled_total
    assert df["fill_decile"].between(0, 10).all()
