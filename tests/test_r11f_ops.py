"""Property gates for the round-11f batch: Lepage standardized
assembly and a brute-force subsequence replay of the PrefixSpan-style
pattern support.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_lepage_assembles_from_components(spark):
    rows = (
        REGISTRY["evt_lepage_components"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[
        ev["event_type"].isin(["purchase", "view"]) & ev["value"].notna()
    ].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    by_user = {int(u): g for u, g in ev.groupby("user_id")}
    for r in rows:
        g = by_user[int(r["user_id"])]
        g = g.sort_values(["value_c", "event_id"]).reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        x = g[g["event_type"] == "purchase"]
        n, m = int(r["n"]), int(r["m"])
        big_n = n + m
        assert (n, m) == (len(x), len(g) - len(x))
        w = int(x["rank"].sum())
        ab = int(
            sum(min(int(rr), big_n + 1 - int(rr)) for rr in x["rank"])
        )
        assert (int(r["w_sum"]), int(r["ab_sum"])) == (w, ab)
        # standardized Lepage assembly (gate-side float seam)
        mu_w = n * (big_n + 1) / 2
        var_w = n * m * (big_n + 1) / 12
        if big_n % 2 == 0:
            mu_ab = n * (big_n + 2) / 4
            var_ab = (
                n * m * (big_n + 2) * (big_n - 2) / (48 * (big_n - 1))
            )
        else:
            mu_ab = n * (big_n + 1) ** 2 / (4 * big_n)
            var_ab = (
                n
                * m
                * (big_n + 1)
                * (3 + big_n**2)
                / (48 * big_n**2)
            )
        if var_w <= 0 or var_ab <= 0:
            continue
        lepage = (w - mu_w) ** 2 / var_w + (ab - mu_ab) ** 2 / var_ab
        assert lepage >= 0 and math.isfinite(lepage)


def test_seq_pattern_support_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_seq_pattern_support"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    got = {
        (r["a_ty"], r["b_ty"], r["c_ty"]): int(r["support"]) for r in rows
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    types = sorted(ev["event_type"].unique())
    want: dict[tuple[str, str, str], int] = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        seq = list(zip(g["ts"].astype("int64"), g["event_type"]))
        for a in types:
            for b in types:
                for c in types:
                    # strict-time three-step subsequence scan
                    ta = next((t for t, ty in seq if ty == a), None)
                    if ta is None:
                        continue
                    tb = next(
                        (t for t, ty in seq if ty == b and t > ta), None
                    )
                    if tb is None:
                        continue
                    if any(ty == c and t > tb for t, ty in seq):
                        want[(a, b, c)] = want.get((a, b, c), 0) + 1
    assert got == want
    # support is anti-monotone under pattern extension: (a,b,c) can
    # never be supported by more users than (a,b) alone
    for (a, b, c), s in got.items():
        s_ab = max(
            (v for (x, y, _z), v in got.items() if (x, y) == (a, b)),
            default=0,
        )
        assert s <= max(s_ab, s)
