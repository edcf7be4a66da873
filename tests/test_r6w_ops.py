"""Property gate for Geary's C."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def test_geary_c_matches_bruteforce(spark):
    df = REGISTRY["evt_geary_c"].spark_fn(spark, SF).toPandas()
    r = df.iloc[0]
    users = (
        keyed_events(spark, SF).select("user_id").toPandas()["user_id"]
    )
    grid = Counter()
    for uid in users:
        h = hashlib.md5(str(int(uid)).encode()).hexdigest()
        lat = int(h[:8], 16) % 180000000 - 90000000
        lon = int(h[8:16], 16) % 360000000 - 180000000
        grid[(lat // 10000000 + 9, lon // 10000000 + 18)] += 1
    n = 18 * 36
    cells = {
        (la, lo): grid.get((la, lo), 0)
        for la in range(18)
        for lo in range(36)
    }
    sq = 0
    for (la, lo), x in cells.items():
        for dla, dlo in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nbk = (la + dla, lo + dlo)
            if nbk in cells:
                sq += (x - cells[nbk]) ** 2
    s = sum(cells.values())
    z2 = sum((n * x - s) ** 2 for x in cells.values())
    w = 2 * (18 * 35 + 17 * 36)
    assert int(r["sq_diff_sum"]) == sq
    assert int(r["z2_den"]) == z2
    c = (n - 1) * sq * n * n / (2 * w * z2)
    assert float(r["geary_c"]) == pytest.approx(c, rel=1e-12)
    # md5-uniform null: C hovers near 1 (no spatial structure)
    assert 0.5 < c < 1.5
    # Geary/Moran complementarity on the same lattice: both near null
    mor = REGISTRY["evt_morans_i"].spark_fn(spark, SF).toPandas().iloc[0]
    assert abs(float(mor["morans_i"])) < 0.2
