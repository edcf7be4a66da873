"""Property gates for the round-6v operators (Moran's I, weekday GOF)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def test_morans_i_matches_bruteforce(spark):
    df = REGISTRY["evt_morans_i"].spark_fn(spark, SF).toPandas()
    r = df.iloc[0]
    users = (
        keyed_events(spark, SF).select("user_id").toPandas()["user_id"]
    )
    grid = Counter()
    for uid in users:
        h = hashlib.md5(str(int(uid)).encode()).hexdigest()
        lat = int(h[:8], 16) % 180000000 - 90000000
        lon = int(h[8:16], 16) % 360000000 - 180000000
        # floor division toward -inf matches SQL floor(x/1e7)
        la = lat // 10000000 + 9
        lo = lon // 10000000 + 18
        grid[(la, lo)] += 1
    n = 18 * 36
    cells = {
        (la, lo): grid.get((la, lo), 0)
        for la in range(18)
        for lo in range(36)
    }
    s = sum(cells.values())
    zz = {k: n * v - s for k, v in cells.items()}
    num = 0
    for (la, lo), z in zz.items():
        for dla, dlo in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (la + dla, lo + dlo)
            if nb in zz:
                num += z * zz[nb]
    den = sum(z * z for z in zz.values())
    w = 2 * (18 * 35 + 17 * 36)
    assert int(r["n_cells"]) == n
    assert int(r["w_total"]) == w
    assert int(r["cross_num"]) == num
    assert int(r["z2_den"]) == den
    morans = (n / w) * (num / den)
    assert float(r["morans_i"]) == pytest.approx(morans, rel=1e-12)
    # md5-uniform points: no real spatial structure; |I| stays small
    assert abs(morans) < 0.2


def test_gof_weekday_matches_bruteforce(spark):
    df = (
        REGISTRY["evt_gof_weekday"].spark_fn(spark, SF).toPandas()
        .set_index("dow")
    )
    rows = (
        keyed_events(spark, SF)
        .select((F.dayofweek("ts") - 1).alias("dow"))
        .toPandas()
    )
    cnt = rows["dow"].value_counts()
    n, k = len(rows), len(cnt)
    assert len(df) == k
    chi_total = 0.0
    for dow, x in cnt.items():
        got = df.loc[dow]
        assert int(got["x"]) == x
        e = n / k
        assert float(got["expected"]) == pytest.approx(e, rel=1e-12)
        comp = (x - e) ** 2 / e
        assert float(got["chi2_component"]) == pytest.approx(
            comp, rel=1e-12
        )
        chi_total += comp
    # events are ~uniform across weekdays in the synthetic data;
    # chi2(6 df) above 50 would mean the fixture changed shape
    assert chi_total < 50
