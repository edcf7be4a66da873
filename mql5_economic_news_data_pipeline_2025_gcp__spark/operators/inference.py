"""Model-inference islands (SURVEY §2.10, M5): Arrow-vectorized
``pandas_udf`` wrappers for the two model families the reference serves,
routed per series by ``model_type`` and unioned (TRAIN:184-231 routing,
TRAIN:196-206 / VAL:91-105 / TEST:85-93 batched LSTM inference,
TRAIN:219-231 / VAL:117-130 / TEST:105-110 XGBoost inference).

Real torch/xgboost models drop in behind the same two UDF seams; the
shipped implementations are DETERMINISTIC stubs chosen so every
arithmetic step is exact in IEEE double (weights are binary fractions,
inputs are integer cents), which makes the full routed-inference
dataflow value-checkable against a SQL oracle — the property the
reference's stochastic models cannot offer (SURVEY §7 risk 5).

Scale notes: scalar-iterator UDFs so per-executor model load happens
once per worker, not once per batch; inputs arrive as Arrow batches
(vectorized numpy inside); the routing join is a broadcast (routing
table is one row per series). Both branches hang off one lineage and
window over the same series key, so they share a single shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Sequence length for the RNN branch (reference SEQ_LENGTH, PARAMS:2).
SEQ_LENGTH = 3

#: Exact binary-fraction attention weights over the sequence, oldest →
#: newest. Sum to 1; every product with integer cents is exact.
RNN_WEIGHTS = (0.25, 0.25, 0.5)


@pandas_udf("double")
def lstm_stub_predict(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """"LSTM" forward pass over fixed-length sequences of integer cents.

    Stub model = exponential-decay weighted sum (binary-fraction
    weights). A torch module replaces the body; the scalar-iterator
    shape (load weights once, stream Arrow batches) is the production
    pattern (TRAIN:196-206).
    """
    w = np.array(RNN_WEIGHTS)  # "model load", once per worker
    for seqs in batches:
        mat = np.vstack([np.asarray(s, dtype="float64") for s in seqs]) \
            if len(seqs) else np.empty((0, len(w)))
        yield pd.Series(mat @ w)


@pandas_udf("double")
def xgb_stub_predict(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """"XGBoost" predict over (lag1_cents, bucket) feature rows.

    Stub model = one depth-2 decision tree with exact leaf arithmetic
    (multiples of 0.25 on integer cents). ``xgb.Booster.predict``
    replaces the body (TRAIN:219-231).
    """
    for lag1, bucket in it:
        x = lag1.to_numpy(dtype="float64")
        b = bucket.to_numpy(dtype="float64")
        pred = np.where(
            x < 0,
            np.where(b < 2, x * 0.5, x * 0.25),
            np.where(b < 2, x * 0.5 + 100.0, x * 0.75),
        )
        yield pd.Series(pred)


def route_and_predict(
    df: DataFrame,
    routing: DataFrame,
    value_col: str = "value_c",
    id_col: str = "event_id",
    key: tuple[str, ...] = ("user_id", "event_type"),
    order: tuple[str, ...] = ("ts", "event_id"),
    seq_length: int = SEQ_LENGTH,
) -> DataFrame:
    """Per-series routed inference: rnn-routed series get sequence
    windows (W4) fed to :func:`lstm_stub_predict`; the rest get lag-1
    features fed to :func:`xgb_stub_predict`; branches unioned
    (SURVEY §2.7: rnn-samples ∪ xgb-samples → one prediction frame).

    ``routing`` is (key..., model_type) — one row per series, broadcast.
    RNN rows without a full ``seq_length`` history and XGB rows without
    a lag are skipped, mirroring the reference's sample construction
    (TRAIN:484-488: first L rows of a group yield no sample).
    """
    routed = df.join(F.broadcast(routing.select(*key, "model_type")), on=list(key))
    w = Window.partitionBy(*key).orderBy(*order)

    rnn = (
        routed.filter(F.col("model_type") == "rnn")
        .withColumn(
            "seq",
            F.collect_list(value_col).over(w.rowsBetween(-seq_length, -1)),
        )
        .filter(F.size("seq") == seq_length)
        .withColumn("prediction", lstm_stub_predict(F.col("seq")))
    )
    xgb = (
        routed.filter(F.col("model_type") == "xgb")
        .withColumn("_lag1", F.lag(value_col, 1).over(w))
        .filter(F.col("_lag1").isNotNull())
        .withColumn(
            "prediction",
            xgb_stub_predict(F.col("_lag1"), (F.col(id_col) % 5).cast("long")),
        )
    )
    out_cols = [id_col, *key, "model_type", "prediction"]
    return rnn.select(*out_cols).unionByName(xgb.select(*out_cols))
