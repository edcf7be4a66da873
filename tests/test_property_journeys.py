"""Property-based gates for the session-3 operators: random inputs vs
pure-python brute force (beyond the fixed testdata the oracle covers)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.asof import (
    asof_nearest_join,
)

BASE = dt.datetime(2024, 1, 1)


@st.composite
def _events(draw):
    lts = draw(
        st.lists(st.integers(0, 1000), min_size=1, max_size=12, unique=True)
    )
    rts = draw(
        st.lists(st.integers(0, 1000), min_size=0, max_size=12, unique=True)
    )
    return lts, rts


@given(_events())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_nearest_matches_bruteforce(spark, ev):
    lts, rts = ev
    left = spark.createDataFrame(
        [(i, "k", BASE + dt.timedelta(seconds=s)) for i, s in enumerate(lts)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", BASE + dt.timedelta(seconds=s), s * 10) for s in rts]
        or [("zz", BASE, 0)],  # schema needs ≥1 row; unmatched key
        "user_id string, ts timestamp, rv long",
    )
    out = {
        r["event_id"]: r["rv_near"]
        for r in asof_nearest_join(
            left, right, key=["user_id"], value_col="rv"
        ).collect()
    }

    def brute(s):
        if not rts:
            return None
        # nearest |Δ|, ties to the EARLIER right row
        best = min(rts, key=lambda r: (abs(r - s), r))
        return best * 10

    for i, s in enumerate(lts):
        assert out[i] == brute(s), (s, sorted(rts), out[i])


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (user, day)
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rolling_distinct_matches_bruteforce(spark, pairs):
    """The interval-merge + sweep form equals the brute-force 'users
    active in the trailing 7 days' count on random activity sets."""
    rows = [
        (u, BASE + dt.timedelta(days=d, hours=1), "view")
        for u, d in pairs
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (u, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r4b import (
        rolling_distinct_days,
    )

    got = {
        (r["day"], r["n_active_7d"]): None
        for r in rolling_distinct_days(ev, window=7).collect()
    }
    days = {d for _, d in pairs}
    for d in days:
        want = len({u for u, dd in pairs if d - 6 <= dd <= d})
        key = ((BASE + dt.timedelta(days=d)).date(), want)
        assert key in got, (d, want, sorted(got))


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 25)),  # (user, day)
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_activity_islands_matches_bruteforce(spark, pairs):
    ev = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(days=d, hours=2), u, "view", 1.0, "{}")
            for i, (u, d) in enumerate(pairs)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window

    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    islands = g.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    got = {
        r["user_id"]: (r["n_islands"], r["longest_run"], r["active_days"])
        for r in islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("run_len").cast("bigint").alias("longest_run"),
            F.sum("run_len").cast("bigint").alias("active_days"),
        )
        .collect()
    }
    by_user: dict[int, set[int]] = {}
    for u, d in pairs:
        by_user.setdefault(u, set()).add(d)
    for u, ds in by_user.items():
        sds = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(sds, sds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[u] == (len(runs), max(runs), len(sds)), (u, sds, got[u])


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 200),  # hours offset
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_windowed_funnel_matches_bruteforce(spark, evts):
    """Single-user funnel vs a direct transcription of the greedy
    first-chain rule (anchor = first view; click in (tv, tv+24h];
    purchase in (tc, tc+48h])."""
    ev = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(hours=h), 1, et, 1.0, "{}")
            for i, (et, h) in enumerate(evts)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY  # noqa: F401
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    )
    s2 = s1.withColumn(
        "tc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("tv"))
                & (F.col("ts") <= F.col("tv") + F.expr("INTERVAL 24 HOUR")),
                F.col("ts"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "tp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("tc"))
                & (F.col("ts") <= F.col("tc") + F.expr("INTERVAL 48 HOUR")),
                F.col("ts"),
            )
        ).over(wu),
    )
    row = (
        s3.groupBy("user_id")
        .agg(F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp"))
        .collect()[0]
    )
    views = sorted(h for et, h in evts if et == "view")
    tv = views[0] if views else None
    tc = None
    if tv is not None:
        clicks = sorted(
            h for et, h in evts if et == "click" and tv < h <= tv + 24
        )
        tc = clicks[0] if clicks else None
    tp = None
    if tc is not None:
        purch = sorted(
            h for et, h in evts if et == "purchase" and tc < h <= tc + 48
        )
        tp = purch[0] if purch else None
    to_h = lambda x: None if x is None else (x - BASE).total_seconds() / 3600
    assert to_h(row["tv"]) == tv and to_h(row["tc"]) == tc and to_h(row["tp"]) == tp


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # user
            st.sampled_from(["a", "b", "c", "d"]),  # type
            st.integers(0, 5),  # day
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_basket_lift_matches_bruteforce(spark, triples):
    """Pair counts / sizes / basket denominator from the sentinel
    single-lineage form equal a direct set computation."""
    ev = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(days=d, hours=3), u, et, 1.0, "{}")
            for i, (u, et, d) in enumerate(triples)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window

    sets = (
        ev.select("user_id", F.to_date("ts").alias("day"), "event_type")
        .groupBy("user_id", "day")
        .agg(F.collect_set("event_type").alias("types"))
        .select(F.array_union("types", F.array(F.lit("~ALL"))).alias("tp"))
    )
    pairs = (
        sets.select(F.explode("tp").alias("a"), "tp")
        .select("a", F.explode("tp").alias("b"))
        .filter(F.col("a") <= F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["a"], r["b"]): r["n"] for r in pairs.collect()}

    baskets: dict[tuple[int, int], set[str]] = {}
    for u, et, d in triples:
        baskets.setdefault((u, d), set()).add(et)
    # sentinel denominator
    assert got[("~ALL", "~ALL")] == len(baskets)
    types = sorted({et for _, et, _ in triples})
    for i, a in enumerate(types):
        assert got.get((a, a), 0) == sum(1 for s in baskets.values() if a in s)
        for b in types[i + 1 :]:
            want = sum(1 for s in baskets.values() if a in s and b in s)
            assert got.get((a, b), 0) == want, (a, b, want, got)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["x", "y", "z"])),
        min_size=3,
        max_size=25,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_topk_paths_matches_bruteforce(spark, evts):
    """Trigram path counts over per-user order equal a direct scan."""
    ev = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(minutes=i), u, et, 1.0, "{}")
            for i, (u, et) in enumerate(evts)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    got = {
        r["path"]: r["n"]
        for r in seq.groupBy(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_user: dict[int, list[str]] = {}
    for i, (u, et) in enumerate(evts):
        by_user.setdefault(u, []).append(et)
    want: dict[str, int] = {}
    for seq_u in by_user.values():
        for i in range(len(seq_u) - 2):
            p = ">".join(seq_u[i : i + 3])
            want[p] = want.get(p, 0) + 1
    assert got == want
