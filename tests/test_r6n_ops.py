"""Property gates for the round-6n operators (plans/queries_r6n.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def test_var_cvar_matches_bruteforce(spark):
    df = _run(spark, "evt_var_cvar").set_index("event_type")
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value_c")
        .toPandas()
    )
    for et, g in rows.groupby("event_type"):
        vals = sorted(g["value_c"].astype(int))
        n = len(vals)
        cnt = Counter(vals)
        cum, var95 = 0, None
        for v in sorted(cnt):
            cum += cnt[v]
            if 20 * cum >= 19 * n:
                var95 = v
                break
        tail = [v for v in vals if v >= var95]
        got = df.loc[et]
        assert int(got["n"]) == n
        assert int(got["var95_c"]) == var95
        assert int(got["tail_n"]) == len(tail)
        assert int(got["tail_sum_c"]) == sum(tail)
        assert float(got["cvar_c"]) == pytest.approx(
            sum(tail) / len(tail), rel=1e-12
        )
        # coherence sanity: CVaR >= VaR, tail is ~5% of mass
        assert float(got["cvar_c"]) >= var95
        assert len(tail) <= n // 20 + max(cnt.values())


def test_granger_matches_numpy_ols(spark):
    df = _run(spark, "evt_granger_lite")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    daily = rows.pivot_table(
        index="day",
        columns="event_type",
        values="value_c",
        aggfunc="sum",
        fill_value=0,
    ).sort_index()
    y = daily["purchase"].astype(float).tolist()
    x = daily["view"].astype(float).tolist()
    import numpy as np

    Y = np.array(y[1:])
    P1 = np.array(y[:-1])
    P2 = np.array(x[:-1])
    n = len(Y)

    def sse(X):
        Xd = np.column_stack([np.ones(n)] + X)
        beta, *_ = np.linalg.lstsq(Xd, Y, rcond=None)
        res = Y - Xd @ beta
        return float(res @ res)

    sse_r = sse([P1])
    sse_u = sse([P1, P2])
    assert int(r["n_obs"]) == n
    # engine SSEs are scaled by n (centered moments carry the common
    # factor); the F statistic is scale-invariant
    assert float(r["sse_r"]) == pytest.approx(n * sse_r, rel=1e-9)
    assert float(r["sse_u"]) == pytest.approx(n * sse_u, rel=1e-9)
    f = (sse_r - sse_u) * (n - 3) / sse_u
    assert float(r["f_stat"]) == pytest.approx(f, rel=1e-9)
    assert float(r["sse_u"]) <= float(r["sse_r"]) + 1e-9
    assert float(r["f_stat"]) >= -1e-9
