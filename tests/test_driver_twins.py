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


def test_driver_view_substitutes_both_sides():
    qs, osql = queries(), oracle_sql()
    for demo, twin in DRIVER_TWINS.items():
        # the spark side under the demo name IS the twin's program, and
        # the oracle under the demo name IS the twin's oracle — the
        # driver compares the twin against its own oracle
        assert qs[demo] is REGISTRY[twin].spark_fn
        assert osql[demo] == REGISTRY[twin].oracle


def test_registry_itself_is_untouched():
    # bench, diffcheck, and the compat smoke time/run the REAL demos
    for demo in DRIVER_TWINS:
        assert REGISTRY[demo].spark_fn is not REGISTRY[
            DRIVER_TWINS[demo]
        ].spark_fn


def test_rows_only_residue_is_streaming_only():
    qs, osql = queries(), oracle_sql()
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == ["stream_heavy_hitters", "stream_hll_distinct"], (
        f"unexpected rows-only set: {rows_only}"
    )
