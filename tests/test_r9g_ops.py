"""Property gates for the round-9g intermittent-demand batch
(plans/queries_r9g.py): brute-force the Syntetos-Boylan quadrant and
the Croston folds from raw parquet rows in pure Python, and pin the
floor-consistent update against a float EWMA reference.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_EPOCH = date(1995, 1, 1)


def _weekly():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    w = defaultdict(lambda: defaultdict(int))
    for r in li.itertuples():
        wi = (pd.Timestamp(r.l_shipdate).date() - _EPOCH).days // 7
        w[int(r.l_partkey)][wi] += int(round(float(r.l_quantity)))
    return w


def test_intermittency_profile_matches_bruteforce(spark):
    got = {
        int(r["pk"]): r
        for r in REGISTRY["rel_intermittency_profile"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    w = _weekly()
    expected = {pk for pk, weeks in w.items() if len(weeks) >= 2}
    assert set(got) == expected
    seen_classes = set()
    for pk in expected:
        weeks = w[pk]
        m = len(weeks)
        s = sum(weeks.values())
        qq = sum(q * q for q in weeks.values())
        fw, lw = min(weeks), max(weeks)
        adi_hi = 100 * (lw - fw) >= 132 * (m - 1)
        cv_hi = 100 * (m * qq - s * s) >= 49 * s * s
        cls = (
            "lumpy" if adi_hi and cv_hi
            else "intermittent" if adi_hi
            else "erratic" if cv_hi
            else "smooth"
        )
        row = got[pk]
        assert (int(row["m"]), int(row["s"]), int(row["qq"])) == (m, s, qq)
        assert (int(row["first_wi"]), int(row["last_wi"])) == (fw, lw)
        assert row["demand_class"] == cls
        seen_classes.add(cls)
        # the exact class test agrees with the float definition off the
        # boundary (cross-multiplication IS the float test, exactly)
        adi = (lw - fw) / (m - 1)
        cv2 = (m * qq - s * s) / (s * s)
        assert adi_hi == (adi >= 1.32) and cv_hi == (cv2 >= 0.49)
    # synthetic TPC-H demand is sparse: the intermittent side must occur
    assert "intermittent" in seen_classes or "lumpy" in seen_classes


def _croston(qs, ws):
    z = qs[0] * 1000
    for q in qs[1:]:
        z += math.floor((q * 1000 - z) / 8.0)
    iv = [ws[i] - ws[i - 1] for i in range(1, len(ws))]
    p = iv[0] * 1000
    for v in iv[1:]:
        p += math.floor((v * 1000 - p) / 8.0)
    return z, p


def test_croston_matches_pure_python(spark):
    got = {
        int(r["pk"]): r
        for r in REGISTRY["rel_croston_intermittent"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    w = _weekly()
    expected = {pk for pk, weeks in w.items() if len(weeks) >= 2}
    assert set(got) == expected
    for pk in expected:
        weeks = sorted(w[pk].items())
        ws = [wi for wi, _ in weeks]
        qs = [q for _, q in weeks]
        z, p = _croston(qs, ws)
        row = got[pk]
        assert int(row["m"]) == len(qs)
        assert int(row["z_milli"]) == z, pk
        assert int(row["p_milli"]) == p, pk
        assert int(row["forecast_micro"]) == z * 1000000 // p
        # the integer fold tracks the float EWMA within quantization
        zf = float(qs[0])
        for q in qs[1:]:
            zf += (q - zf) / 8.0
        assert abs(z / 1000 - zf) <= 0.008 * len(qs) + 0.001
        assert p >= 1000  # intervals are >= 1 week
