"""Property gates for the round-6c operators (plans/queries_r6c.py).

Differential hashes (diffcheck/driver) prove engine == oracle; these
pin the invariants both sides could get wrong together: apportionment
conservation (seats sum EXACTLY to the house size — the property the
naive round() implementation violates), interval-union bounds, band-join
symmetry/conservation, entity-resolution confusion-matrix consistency,
and the change-point objective dominating the no-split baseline.
"""

from __future__ import annotations

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


# ------------------------------------------------- apportionment


def test_apportionment_conserves_house_size(spark):
    df = _run(spark, "rel_seat_apportionment")
    assert int(df["seats"].sum()) == 1000
    # Hamilton quota property: every group's seats is floor or ceil of
    # its exact quota 1000 * rev / total.
    tot = int(df["rev_c"].sum())
    for _, row in df.iterrows():
        base = (1000 * int(row["rev_c"])) // tot
        assert int(row["seats"]) in (base, base + 1)


# ------------------------------------------------- interval coverage


def test_interval_coverage_bounds(spark):
    """Union length is sandwiched: max single interval <= covered <=
    min(sum of lengths, span)."""
    import pyspark.sql.functions as F

    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
        keyed_events,
    )

    cov = _run(spark, "evt_interval_coverage").set_index("user_id")

    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    s_us = F.unix_micros("ts")
    iv = ev.select(
        "user_id",
        s_us.alias("s"),
        (s_us + (F.abs(F.col("value_c")) % 3600) * 1000000).alias("e"),
    )
    ref = (
        iv.groupBy("user_id")
        .agg(
            F.sum(F.col("e") - F.col("s")).alias("sum_len"),
            F.max(F.col("e") - F.col("s")).alias("max_len"),
            (F.max("e") - F.min("s")).alias("span"),
            F.count(F.lit(1)).alias("n"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert set(cov.index) == set(ref.index)
    for uid in cov.index:
        covered = int(cov.loc[uid, "covered_us"])
        assert int(cov.loc[uid, "n_intervals"]) == int(ref.loc[uid, "n"])
        assert covered >= int(ref.loc[uid, "max_len"])
        assert covered <= int(ref.loc[uid, "sum_len"])
        assert covered <= int(ref.loc[uid, "span"])


def test_interval_coverage_exact_small(spark):
    """Brute-force the union on a handful of users via python sets of
    microsecond ranges collapsed to sorted merge — exact equality."""
    import pyspark.sql.functions as F

    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
        keyed_events,
    )

    cov = _run(spark, "evt_interval_coverage").set_index("user_id")
    ev = keyed_events(spark, SF).filter(F.col("value").isNotNull())
    s_us = F.unix_micros("ts")
    rows = (
        ev.select(
            "user_id",
            s_us.alias("s"),
            (s_us + (F.abs(F.col("value_c")) % 3600) * 1000000).alias("e"),
        )
        .toPandas()
    )
    for uid, grp in list(rows.groupby("user_id"))[:10]:
        ivs = sorted(zip(grp["s"], grp["e"]))
        covered, cur_s, cur_e = 0, None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert int(cov.loc[uid, "covered_us"]) == covered


# ------------------------------------------------- band join


def test_band_join_conserves_parts_and_counts_symmetric_pairs(spark):
    df = _run(spark, "rel_price_band_join")
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

    n_parts = t(spark, SF, "part").count()
    assert int(df["n_parts"].sum()) == n_parts
    # Comparability is symmetric, so the total directed-pair count
    # (sum of size*freq) must be even.
    assert int((df["n_comparable"] * df["n_parts"]).sum()) % 2 == 0


def test_band_join_matches_bruteforce(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

    df = _run(spark, "rel_price_band_join")
    prices = [
        int(round(p * 100))
        for (p,) in t(spark, SF, "part").select("p_retailprice").collect()
    ]
    from collections import Counter

    per = []
    for i, a in enumerate(prices):
        per.append(
            sum(
                1
                for j, b in enumerate(prices)
                if j != i and abs(a - b) <= 100
            )
        )
    want = Counter(per)
    got = {
        int(r["n_comparable"]): int(r["n_parts"]) for _, r in df.iterrows()
    }
    assert got == dict(want)


# ------------------------------------------------- entity resolution


def test_entity_resolution_confusion_matrix_consistent(spark):
    df = _run(spark, "rel_entity_resolution")
    assert len(df) == 1
    r = df.iloc[0]
    assert int(r["tp"]) <= int(r["n_matched"]) <= int(r["n_b"])
    assert int(r["fp"]) == int(r["n_matched"]) - int(r["tp"])
    assert int(r["fn"]) == int(r["n_b"]) - int(r["tp"])
    assert 0 <= int(r["prec_bp"]) <= 10000
    assert 0 <= int(r["recall_bp"]) <= 10000
    # The clean 12/13 of B records normalize to an exact master match
    # (distance 0) — recall is bounded below by that fraction.
    assert int(r["recall_bp"]) >= 10000 * 12 // 13 - 100
    assert int(r["n_golden"]) == int(r["n_a"]) + int(r["n_b"]) - int(
        r["n_matched"]
    )


# ------------------------------------------------- change point


def test_changepoint_objective_dominates_no_split(spark):
    """The chosen split's L2/nl + R2/nr must beat (or tie) the global
    T2/n baseline — guaranteed by Cauchy-Schwarz, and any argmax bug
    (e.g. sign flip) breaks it."""
    df = _run(spark, "evt_changepoint_sse")
    assert len(df) == 1
    r = df.iloc[0]
    L, nl = int(r["left_sum_c"]), int(r["left_n"])
    R, nr = int(r["right_sum_c"]), int(r["right_n"])
    T, n = L + R, nl + nr
    assert nl > 0 and nr > 0
    assert float(r["objective"]) >= (T * T) / n - 1e-6
    # objective recomputes from the reported integer components
    assert float(r["objective"]) == pytest.approx(
        L * L / nl + R * R / nr, rel=1e-12
    )
