"""Gates for the driver-contract twin substitution
(plans/registry.py::DRIVER_TWINS): rows-only demo queries resolve to
their oracle-paired deterministic twins in the ``queries()`` /
``oracle_sql()`` driver view, while REGISTRY keeps the real demos."""

from __future__ import annotations

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import (
    REGISTRY,
    oracle_sql,
    queries,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.registry import (
    DRIVER_TWINS,
)


def test_every_twin_exists_and_is_oracle_paired():
    for demo, twin in DRIVER_TWINS.items():
        assert demo in REGISTRY, demo
        assert twin in REGISTRY, twin
        assert REGISTRY[twin].oracle is not None, (
            f"twin {twin} of {demo} must stay oracle-paired"
        )
        # a demo that grows its own oracle should drop out of the map
        assert REGISTRY[demo].oracle is None, (
            f"{demo} is oracle-paired itself; remove its DRIVER_TWINS entry"
        )


def test_driver_view_substitutes_both_sides_with_visible_marker():
    qs, osql = queries(), oracle_sql()
    for demo, twin in DRIVER_TWINS.items():
        # the spark side under the demo name is the twin's program
        # wrapped to stamp a driver-visible substituted_by column, and
        # the oracle under the demo name is the twin's oracle wrapped
        # to stamp the identical constant — the driver compares the
        # twin against its own oracle and RECORDS the swap in the
        # row's own schema (round-11 ADVICE transparency fix)
        assert getattr(qs[demo], "substituted_by", None) == twin
        assert f"'{twin}' AS substituted_by" in osql[demo]
        assert REGISTRY[twin].oracle.strip() in osql[demo]


def test_marked_twin_executes_with_marker(spark):
    """Run one substituted entry end-to-end: the driver-visible frame
    is the twin's output plus the constant marker column."""
    demo, twin = "emb_mmr_rerank", DRIVER_TWINS["emb_mmr_rerank"]
    out = queries()[demo](spark, "/root/testdata/sf0.001")
    assert "substituted_by" in out.columns
    rows = out.limit(5).collect()
    assert rows and all(r["substituted_by"] == twin for r in rows)
    bare = REGISTRY[twin].spark_fn(spark, "/root/testdata/sf0.001")
    assert out.drop("substituted_by").columns == bare.columns


def test_registry_itself_is_untouched():
    # bench, diffcheck, and the compat smoke time/run the REAL demos
    for demo in DRIVER_TWINS:
        assert REGISTRY[demo].spark_fn is not REGISTRY[
            DRIVER_TWINS[demo]
        ].spark_fn


def test_no_rows_only_driver_cells_remain():
    # round 12 retired the last two rows-only streaming queries via
    # portable-sketch oracles: every driver-view entry is hash-checked
    qs, osql = queries(), oracle_sql()
    assert sorted(set(qs) - set(osql)) == []
