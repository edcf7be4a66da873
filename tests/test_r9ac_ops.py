"""Property gate for the round-9ac Walsh–Hadamard batch
(plans/queries_r9ac.py): brute-force the sequency-ordered WHT over
8-day blocks in Python bigints and pin the Parseval identity exactly.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_S20 = 1048576


def _h8():
    h = [[1]]
    while len(h) < 8:
        h = [r + r for r in h] + [r + [-v for v in r] for r in h]
    return sorted(
        h, key=lambda r: sum(1 for a, b in zip(r, r[1:]) if a != b)
    )


def test_walsh_hadamard_energy_and_parseval(spark):
    rows = (
        REGISTRY["evt_walsh_hadamard_energy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(r["event_type"], int(r["seq"])): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    h8 = _h8()
    # sequency ordering sanity: row k has exactly k sign changes
    for k, row in enumerate(h8):
        assert sum(1 for a, b in zip(row, row[1:]) if a != b) == k
    want_keys = set()
    for et, g in ev.groupby("event_type"):
        xs = [int(x) for x in g.groupby("day")["v"].sum().sort_index()]
        blocks = [
            xs[i : i + 8] for i in range(0, len(xs) - len(xs) % 8, 8)
        ]
        energy = defaultdict(int)
        abs_sum = defaultdict(int)
        for blk in blocks:
            for k in range(8):
                c = sum(h * x for h, x in zip(h8[k], blk))
                energy[k] += c * c
                abs_sum[k] += abs(c)
        for k in range(8):
            want_keys.add((et, k))
            row = got[(et, k)]
            assert int(row["n_blocks"]) == len(blocks)
            assert int(row["sum_abs_c"]) == abs_sum[k], (et, k)
            got_e = (
                int(row["e2"]) * _S20 * _S20
                + int(row["e1"]) * _S20
                + int(row["e0"])
            )
            assert got_e == energy[k], (et, k)
        # Parseval: sum over sequencies of c^2 == 8 * sum x^2 (blocks)
        total_e = sum(energy.values())
        sum_x2 = sum(x * x for blk in blocks for x in blk)
        assert total_e == 8 * sum_x2, et
    assert set(got) == want_keys
