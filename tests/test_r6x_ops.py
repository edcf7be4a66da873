"""Property gate for the LISA (local Moran's I) quadrant census."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def test_local_morans_matches_bruteforce_and_sums_to_global(spark):
    df = (
        REGISTRY["evt_local_morans"].spark_fn(spark, SF).toPandas()
        .set_index("quadrant")
    )
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
    s = sum(cells.values())
    zz = {k: n * v - s for k, v in cells.items()}
    z2 = sum(z * z for z in zz.values())
    agg = defaultdict(lambda: [0, 0, 0])  # cells, num_sum, links
    global_num = 0
    for (la, lo), z in zz.items():
        nsum = 0
        links = 0
        for dla, dlo in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nbk = (la + dla, lo + dlo)
            if nbk in zz:
                nsum += zz[nbk]
                links += 1
        if z > 0 and nsum > 0:
            q = "HH"
        elif z < 0 and nsum < 0:
            q = "LL"
        elif z > 0 and nsum <= 0:
            q = "HL"
        elif z < 0 and nsum >= 0:
            q = "LH"
        else:
            q = "ZZ"
        agg[q][0] += 1
        agg[q][1] += z * nsum
        agg[q][2] += links
        global_num += z * nsum
    for q, (nc, num, links) in agg.items():
        assert int(df.loc[q, "n_cells"]) == nc, q
        assert int(df.loc[q, "local_num_sum"]) == num, q
        assert int(df.loc[q, "neighbor_links"]) == links, q
        assert float(df.loc[q, "local_i_sum"]) == pytest.approx(
            num * n / z2, rel=1e-12
        )
    assert int(df["n_cells"].sum()) == n
    # LISA decomposition: sum of local numerators == global cross sum
    mor = REGISTRY["evt_morans_i"].spark_fn(spark, SF).toPandas().iloc[0]
    assert int(df["local_num_sum"].sum()) == int(mor["cross_num"])
