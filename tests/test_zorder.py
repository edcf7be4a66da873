"""Z-order layout (sources/layout.py): multi-dimensional clustering
must beat single-dimension sorting at file skipping on the
second dimension, and pruned reads must stay exactly correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources import txn
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.layout import (
    morton_key,
    write_zordered,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_FILES = 16


def _events2d(spark):
    return load_table(spark, SF, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    ).filter(F.col("value_c").isNotNull())


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long"
    )
    out = df.select(
        morton_key([F.col("a"), F.col("b")], bits=4).alias("z")
    ).collect()
    # bit i of a → position 2i; bit i of b → position 2i+1
    def ref(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert [r["z"] for r in out] == [ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5)]


def test_zorder_prunes_second_dimension(spark, tmp_path):
    """A linear sort on user_id cannot skip files for a value_c-only
    predicate (every file spans the whole value domain); the Z-ordered
    table can."""
    ev = _events2d(spark)
    lin_root, z_root = str(tmp_path / "lin"), str(tmp_path / "z")
    txn.overwrite_with_stats(
        ev, lin_root, stat_cols=["user_id", "value_c"], num_files=N_FILES
    )
    write_zordered(ev, z_root, cols=["user_id", "value_c"], num_files=N_FILES)

    stats = ev.agg(F.min("value_c"), F.max("value_c")).first()
    lo, hi = stats[0], stats[1]
    q_lo, q_hi = lo, lo + (hi - lo) // 8  # narrow band on the 2nd dim

    lin_df, lin_scanned, lin_total = txn.read_pruned(
        spark, lin_root, "value_c", q_lo, q_hi
    )
    z_df, z_scanned, z_total = txn.read_pruned(
        spark, z_root, "value_c", q_lo, q_hi
    )
    assert lin_total == z_total
    # exactness on both layouts
    expected = ev.filter(
        (F.col("value_c") >= q_lo) & (F.col("value_c") <= q_hi)
    ).count()
    assert lin_df.count() == expected
    assert z_df.count() == expected
    # the point of z-ordering: second-dimension skipping actually happens
    assert z_scanned < lin_scanned, (
        f"z-order scanned {z_scanned}/{z_total}, linear {lin_scanned}"
    )


def test_zorder_rectangle_probe_multi(spark, tmp_path):
    ev = _events2d(spark)
    root = str(tmp_path / "zr")
    write_zordered(ev, root, cols=["user_id", "value_c"], num_files=N_FILES)
    ub = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value_c"), F.max("value_c")
    ).first()
    preds = {
        "user_id": (ub[0], ub[0] + max(1, (ub[1] - ub[0]) // 4)),
        "value_c": (ub[2], ub[2] + max(1, (ub[3] - ub[2]) // 4)),
    }
    df, scanned, total = txn.read_pruned_multi(spark, root, preds)
    expected = ev.filter(
        (F.col("user_id") >= preds["user_id"][0])
        & (F.col("user_id") <= preds["user_id"][1])
        & (F.col("value_c") >= preds["value_c"][0])
        & (F.col("value_c") <= preds["value_c"][1])
    ).count()
    assert df.count() == expected
    assert scanned < total, "rectangle probe should skip files"
