"""Gates for the transformWithState ListState interval-union twin.

The single-file fixture drains in ONE micro-batch, which never
exercises the ListState get/put round-trip across batches — exactly
the path where the typed-list representation could diverge from the
opaque-tuple twin. This gate splits the events table into 24 shuffled
part files (3 triggers at maxFilesPerTrigger=8) so state survives and
merges across batches, then checks the drain against the batch sweep
computed in DuckDB on the same parts.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.compat import (
    ensure_protobuf,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_PARTS = 24  # > maxFilesPerTrigger(8) => at least 3 micro-batches


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("iu_tws")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # shuffle deterministically so batches interleave users/time (the
    # back-fill case the merged-segment state must survive)
    ev = ev.sample(frac=1.0, random_state=7).reset_index(drop=True)
    d = base / "events.parquet"
    d.mkdir()
    for i in range(_PARTS):
        ev.iloc[i::_PARTS].to_parquet(d / f"part-{i:02d}.parquet",
                                      index=False)
    return str(base)


def test_listate_union_exact_across_batches(spark, split_dir):
    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime on this image")
    import duckdb

    got = {
        int(r["user_id"]): (int(r["n_intervals"]), int(r["covered_us"]))
        for r in REGISTRY["stream_interval_union_tws"]
        .spark_fn(spark, split_dir)
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{split_dir}/events.parquet/*.parquet'"
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(
            REGISTRY["stream_interval_union_tws"].oracle
        ).fetchall()
    }
    assert got == want
    # the split really produced multiple batches' worth of per-user
    # updates: at least one user must have merged across triggers
    # (n_intervals > a single part's share)
    assert max(n for n, _ in got.values()) > 1


def test_mapstate_histogram_exact_across_batches(spark, split_dir):
    """Same multi-batch construction for the MapState twin: per-type
    cells must accumulate across triggers (getValue of a cell written
    in an earlier batch), matching the batch GROUP BY on the parts."""
    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime on this image")
    import duckdb

    got = {
        (int(r["user_id"]), r["event_type"]): (int(r["n"]), int(r["sum_c"]))
        for r in REGISTRY["stream_user_type_histogram_tws"]
        .spark_fn(spark, split_dir)
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{split_dir}/events.parquet/*.parquet'"
    )
    want = {
        (int(r[0]), r[1]): (int(r[2]), int(r[3]))
        for r in con.execute(
            REGISTRY["stream_user_type_histogram_tws"].oracle
        ).fetchall()
    }
    assert got == want
    # cross-batch accumulation really happened: with 24 shuffled parts
    # some (user, type) cell must exceed any single part's share
    assert max(n for n, _ in got.values()) > 1
