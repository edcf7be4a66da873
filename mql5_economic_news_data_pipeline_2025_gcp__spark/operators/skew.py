"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast-free joins.

Economic calendars are heavily skewed — a few currencies (USD, EUR)
dominate the `(Currency, Event)` key space (SURVEY §4: AQE skew notes).
AQE's skew-join splitting covers joins automatically; for aggregations
whose single hot key would bottleneck one reducer, the classic fix is
salting: spread each key over ``n_salt`` sub-keys, partially aggregate,
then merge the sub-aggregates. Two small shuffles replace one skewed
one; the second shuffle carries only |keys|×n_salt rows.

Only algebraic aggregates decompose this way (sum/count/min/max, and
avg as sum+count). The helpers below take named specs so the merge
step is generated correctly per aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name → (phase1 fn, phase2 merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (agg_name, input_col), agg_name in
    {sum, count, min, max, avg}. avg is decomposed into salted sum+count
    and finalized exactly (sum/count), never averaged-of-averages.

    Phase 1 groups by (key…, salt) — the hot key's rows spread over
    ``n_salt`` reducers; phase 2 merges the tiny partial frame.
    """
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salt

    phase1_aggs = []
    phase2_aggs = []
    for out, (name, col) in aggs.items():
        if name == "avg":
            phase1_aggs.append(F.sum(col).alias(f"_s_{out}"))
            phase1_aggs.append(F.count(col).alias(f"_c_{out}"))
            phase2_aggs.append(
                (F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out)
            )
        else:
            p1, p2 = _ALGEBRAIC[name]
            phase1_aggs.append(p1(col).alias(f"_p_{out}"))
            phase2_aggs.append(p2(f"_p_{out}").alias(out))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key, "_salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*key).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: Sequence[str],
    n_salt: int = 16,
) -> DataFrame:
    """Salted replicated join for when the small side is too big to
    broadcast but the big side has hot keys: the big side gets a random
    salt, the small side is replicated n_salt times with every salt
    value, and the join key becomes (key…, salt) — hot keys spread over
    n_salt tasks. Prefer ``F.broadcast`` when the small side fits; this
    is the fallback tier. (AQE skew-join handles the sort-merge case
    automatically; this form is for deliberate pre-salting.)
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    big = skewed.withColumn(
        "_salt",
        ((F.spark_partition_id() + F.monotonically_increasing_id()) % n_salt).cast(
            "int"
        ),
    )
    rep = small.select("*", salts)
    return big.join(rep, on=[*key, "_salt"]).drop("_salt")
