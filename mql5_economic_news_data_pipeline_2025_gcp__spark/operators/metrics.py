"""Per-group R²/MSE/Samples metric aggregate (reference A7 —
``calculate_metrics_vectorized`` TRAIN:169-269, VAL:132-166,
TEST:124-133).

Reference semantics preserved exactly:
- ``ss_res = Σ(a-p)²``; ``ss_tot = Σ(a-mean(a))²``
- ``R2 = 1 - ss_res/ss_tot``, but **-1.0 when ss_tot == 0** (constant
  actuals guard, TRAIN:254-257)
- ``MSE = mean((a-p)²)``; ``Samples = n``
- groups with fewer than 2 scored samples are dropped (TRAIN:240-241)

Spark-first: ONE hash aggregate (partial + final, map-side combine free
from Catalyst). ``ss_tot`` is computed as ``var_pop(a) * n`` — the
population variance identity — so no second pass over the data and no
join. At 100 TB this is a single shuffle on the (already skew-handled)
series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SAMPLES = 2


def group_metrics(
    df: DataFrame,
    actual_col: str = "actual",
    pred_col: str = "prediction",
    key: Sequence[str] = ("Currency", "Event"),
    min_samples: int = MIN_SAMPLES,
) -> DataFrame:
    """→ key cols + R2 (double), MSE (double), Samples (long).

    Rows where either actual or prediction is null are excluded from the
    score (the reference only scores realized (a, p) pairs)."""
    a, p = F.col(actual_col), F.col(pred_col)
    scored = df.filter(a.isNotNull() & p.isNotNull())
    err2 = F.pow(a - p, F.lit(2))
    agg = scored.groupBy(*key).agg(
        F.count(F.lit(1)).alias("Samples"),
        F.avg(err2).alias("MSE"),
        F.sum(err2).alias("_ss_res"),
        F.var_pop(a).alias("_var"),
    )
    ss_tot = F.col("_var") * F.col("Samples")
    r2 = F.when(F.col("_var") == 0, F.lit(-1.0)).otherwise(
        F.lit(1.0) - F.col("_ss_res") / ss_tot
    )
    return (
        agg.filter(F.col("Samples") >= min_samples)
        .withColumn("R2", r2)
        .select(*key, "R2", "MSE", "Samples")
    )


def group_metrics_exact(
    df: DataFrame,
    actual_cents: str,
    pred_cents: str,
    key: Sequence[str] = ("Currency", "Event"),
    min_samples: int = MIN_SAMPLES,
    scale: float = 10000.0,
) -> DataFrame:
    """Integer-exact variant of :func:`group_metrics` for differential
    testing: actual/pred arrive as integer cents, every aggregate is an
    exact int64 sum, and R²/MSE are single exact-int divisions —
    bit-reproducible across engines (see plans.registry determinism
    contract).

    Identities used (all integer until the final division):
      ss_res = Σ(a-p)²
      ss_tot = Σa² - (Σa)²/n    ⇒  R² = 1 - n·ss_res / (n·Σa² - (Σa)²)
      MSE    = (ss_res / n) / scale     (scale converts cents² → value²)
    """
    a, p = F.col(actual_cents), F.col(pred_cents)
    scored = df.filter(a.isNotNull() & p.isNotNull())
    agg = scored.groupBy(*key).agg(
        F.count(F.lit(1)).alias("Samples"),
        F.sum((a - p) * (a - p)).alias("_ss_res"),
        F.sum(a).alias("_sum_a"),
        F.sum(a * a).alias("_sum_a2"),
    )
    den = F.col("Samples") * F.col("_sum_a2") - F.col("_sum_a") * F.col("_sum_a")
    r2 = F.when(den == 0, F.lit(-1.0)).otherwise(
        F.lit(1.0) - (F.col("Samples") * F.col("_ss_res")) / den
    )
    mse = (F.col("_ss_res") / F.col("Samples")) / F.lit(scale)
    return (
        agg.filter(F.col("Samples") >= min_samples)
        .withColumn("R2", r2)
        .withColumn("MSE", mse)
        .select(*key, "R2", "MSE", "Samples")
    )


def metrics_summary(metrics: DataFrame) -> DataFrame:
    """A8: scalar summary over a metric table (reference VAL:317-319)."""
    return metrics.agg(
        F.avg("R2").alias("mean_R2"),
        F.avg("MSE").alias("mean_MSE"),
        F.sum("Samples").alias("total_samples"),
        F.count(F.lit(1)).alias("n_groups"),
    )
