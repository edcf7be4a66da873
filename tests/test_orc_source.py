"""ORC source/sink coverage: value-fidelity roundtrip and scan-level
pushdown — the S-family contract (SURVEY §2.1) for the second columnar
container."""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.orc import (
    orc_roundtrip_check,
    read_orc,
    write_orc,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_events(spark, tmp_path):
    """Events (timestamps, doubles, strings, JSON props) survive an ORC
    write/read bit-for-bit at the digest level."""
    ev = load_table(spark, SF, "events")
    assert orc_roundtrip_check(spark, ev, str(tmp_path / "ev.orc"))


def test_orc_roundtrip_lineitem(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").limit(2000)
    assert orc_roundtrip_check(spark, li, str(tmp_path / "li.orc"))


def test_orc_pushdown(spark, tmp_path):
    """Filters and column pruning reach the ORC scan exactly as with
    parquet: the executed plan advertises PushedFilters and a pruned
    ReadSchema."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev.orc")
    write_orc(ev, path)
    q = (
        read_orc(spark, path)
        .filter(F.col("event_type") == "click")
        .select("event_id", "event_type")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Scan orc" in plan, plan
    assert "PushedFilters: [" in plan and "event_type" in plan.split(
        "PushedFilters"
    )[1][:200], plan
    schema_frag = plan.split("ReadSchema")[1][:200]
    assert "value" not in schema_frag, schema_frag  # pruned column
