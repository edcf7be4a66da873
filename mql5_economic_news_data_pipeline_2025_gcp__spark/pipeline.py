"""Orchestration API mirroring the reference's FastAPI surface
(SURVEY §2.11): train / validate / test / automate as Python functions
over Spark DataFrames, with the reference's parameter-merge and skip
semantics (API:241-267, API:318-373).

The engine produces model *inputs* (normalized features/sequences) and
consumes model *outputs* (predictions) as DataFrames; actual LSTM/XGB
training is out of engine scope (SURVEY §2.10). A deterministic stub
predictor (lag-1) keeps the full dataflow runnable and oracle-checkable;
real models drop in behind ``predict_fn``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.features import (
    latest_per_group,
    with_filled,
    with_high_impact_count,
    with_lag_features,
    with_min_max_normalized,
    normalization_params,
)
from .operators.metrics import group_metrics, metrics_summary
from .operators.routing import model_routing, with_model_type
from .operators.split import split_labels

#: Reference defaults (API:30-42 = TRAIN:20-32; PARAMS file overrides).
DEFAULT_PARAMS = {
    "SEQ_LENGTH": 5,
    "HIDDEN_SIZE": 64,
    "NUM_LAYERS": 2,
    "DROPOUT": 0.2,
    "BATCH_SIZE": 64,
    "EPOCHS": 1,
    "LEARNING_RATE": 0.001,
    "WEIGHT_DECAY": 1e-4,
    "XGB_N_ESTIMATORS": 100,
    "XGB_MAX_DEPTH": 3,
    "XGB_LEARNING_RATE": 0.1,
}


def merge_params(
    file_params: dict | None,
    body_params: dict | None,
    merge: bool = True,
    last_run_params: dict | None = None,
) -> dict:
    """Reference param resolution (API:241-264) plus the last-run
    fallback (API:124-150, where MLflow's most recent run supplies
    params when neither file nor body has them): precedence is
    defaults < last_run < file < body when ``merge`` — otherwise the
    single strongest present source (body, else file, else last_run)
    overrides defaults alone. Non-model keys pass through untouched."""
    out = dict(DEFAULT_PARAMS)
    if merge:
        out.update(last_run_params or {})
        out.update(file_params or {})
        out.update(body_params or {})
    else:
        for src in (body_params, file_params, last_run_params):
            if src is not None:
                out.update(src)
                break
    return out


def load_params_file(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def record_run_params(history_path: str, params: dict, run_id: int | None = None) -> int:
    """Append one run's params to the history log (the engine's MLflow-
    tracking analogue — driver-side run metadata, one JSON line per run,
    NOT data-plane state). Returns the run id."""
    prev = load_params_history(history_path)
    rid = run_id if run_id is not None else (max(prev) + 1 if prev else 1)
    os.makedirs(os.path.dirname(history_path) or ".", exist_ok=True)
    with open(history_path, "a") as fh:
        fh.write(json.dumps({"run_id": rid, "params": params}) + "\n")
    return rid


def load_params_history(history_path: str) -> dict[int, dict]:
    """run_id → params for every recorded run."""
    if not os.path.exists(history_path):
        return {}
    out: dict[int, dict] = {}
    with open(history_path) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                out[rec["run_id"]] = rec["params"]
    return out


def load_last_run_params(history_path: str) -> dict | None:
    """The most recent run's params, or None with no history — the
    fallback source ``merge_params`` consults (API:124-150 parity)."""
    hist = load_params_history(history_path)
    return hist[max(hist)] if hist else None


@dataclass
class PipelineResult:
    metrics: DataFrame
    summary: DataFrame
    extra: dict = field(default_factory=dict)


SERIES_KEY = ("Currency", "Event")


def _default_predict(df: DataFrame) -> DataFrame:
    """Deterministic stub model: predict the lagged value (FIXTURES B5)."""
    return df.withColumn("prediction", F.col("value_lag1"))


def routed_stub_predict(
    df: DataFrame,
    key=SERIES_KEY,
    order=("event_ts",),
) -> DataFrame:
    """M5↔M6 integration: route each series through its pandas_udf
    inference island (LSTM-stub over sequence windows for 'rnn' series,
    XGB-stub over lag features otherwise — TRAIN:184-231). Expects a
    ``model_type`` column (from routing.with_model_type); rows a branch
    cannot score (short history / no lag) get NULL predictions, which
    the metric aggregate then ignores — the reference's skip behavior.
    """
    from .operators.inference import SEQ_LENGTH, lstm_stub_predict, xgb_stub_predict

    w = Window.partitionBy(*key).orderBy(*order)
    rnn = (
        df.filter(F.col("model_type") == "rnn")
        .withColumn(
            "_seq", F.collect_list("value").over(w.rowsBetween(-SEQ_LENGTH, -1))
        )
        .withColumn(
            "prediction",
            F.when(
                F.size("_seq") == SEQ_LENGTH, lstm_stub_predict(F.col("_seq"))
            ),
        )
        .drop("_seq")
    )
    xgb = df.filter(F.col("model_type") != "rnn").withColumn(
        "prediction",
        F.when(
            F.col("value_lag1").isNotNull(),
            xgb_stub_predict(F.col("value_lag1"), F.lit(0).cast("long")),
        ),
    )
    return rnn.unionByName(xgb)


def build_features(
    events: DataFrame,
    key=SERIES_KEY,
    order=("event_ts",),
    fill_direction: str = "ffill_then_bfill",
) -> DataFrame:
    """The reference's create_features chain (TRAIN:415-433): high-impact
    count, lag-1 features, directional fill. One shuffle on the series
    key services every window."""
    df = events.withColumn("EventDate", F.to_date(F.col(order[0])))
    df = with_high_impact_count(
        df, impact_col="ImpactOrdinal", currency_col=key[0], date_col="EventDate"
    )
    df = with_lag_features(df, ["value"], key=key, order=order)
    df = with_filled(df, ["value_lag1"], key=key, order=order, direction=fill_direction)
    return df


def run_train(
    events: DataFrame,
    params: dict | None = None,
    predict_fn: Callable[[DataFrame], DataFrame] = _default_predict,
    key=SERIES_KEY,
    order=("event_ts",),
    exact_split: bool = True,
) -> PipelineResult:
    """POST /train analogue: features → split → routing → normalize →
    predict → per-group metrics (TRAIN:272-586).

    ``exact_split=True`` is the reference floor-arithmetic parity form
    (global window — small SF only); ``False`` selects the
    approxQuantile-cutoff scale path (map-only labeling, no global
    sort) — the form a 100 TB run must use."""
    params = params or merge_params(None, None)
    feats = build_features(events, key=key, order=order)
    labeled = split_labels(feats, order=order, exact=exact_split)
    train_df = labeled.filter(F.col("split") == "train")
    routing = model_routing(train_df, key=key)
    train_df = with_model_type(train_df, routing, key=key)
    train_df = with_min_max_normalized(train_df, ["value"], key=key)
    norm_params = normalization_params(train_df, ["value"], key=key)
    scored = predict_fn(train_df)
    metrics = group_metrics(scored, actual_col="value", pred_col="prediction", key=key)
    return PipelineResult(
        metrics=metrics,
        summary=metrics_summary(metrics),
        extra={"routing": routing, "norm_params": norm_params, "params": params},
    )


def run_validate(
    events: DataFrame,
    train_result: PipelineResult,
    predict_fn: Callable[[DataFrame], DataFrame] = _default_predict,
    key=SERIES_KEY,
    order=("event_ts",),
    exact_split: bool = True,
) -> PipelineResult:
    """POST /validate analogue: re-derive features on the val split ONLY
    (leakage-aware, VAL:220-236), normalize with TRAINING params +
    fallback (VAL:258-287), score, per-group metrics."""
    labeled = split_labels(events, order=order, exact=exact_split)
    val = labeled.filter(F.col("split") == "val")
    feats = build_features(val, key=key, order=order, fill_direction="bfill_then_ffill")
    feats = with_min_max_normalized(
        feats, ["value"], key=key, params=train_result.extra["norm_params"]
    )
    feats = with_model_type(feats, train_result.extra["routing"], key=key)
    scored = predict_fn(feats)
    metrics = group_metrics(scored, actual_col="value", pred_col="prediction", key=key)
    return PipelineResult(metrics=metrics, summary=metrics_summary(metrics))


def run_test(
    events: DataFrame,
    train_result: PipelineResult,
    predict_fn: Callable[[DataFrame], DataFrame] = _default_predict,
    key=SERIES_KEY,
    order=("event_ts",),
    exact_split: bool = True,
) -> PipelineResult:
    """POST /test analogue: test-split metrics + live forecast = latest
    denormalized prediction per series (TEST:95-120)."""
    labeled = split_labels(events, order=order, exact=exact_split)
    test = labeled.filter(F.col("split") == "test")
    feats = build_features(test, key=key, order=order, fill_direction="bfill_then_ffill")
    feats = with_min_max_normalized(
        feats, ["value"], key=key, params=train_result.extra["norm_params"]
    )
    feats = with_model_type(feats, train_result.extra["routing"], key=key)
    scored = predict_fn(feats)
    metrics = group_metrics(scored, actual_col="value", pred_col="prediction", key=key)
    live = latest_per_group(
        scored.filter(F.col("prediction").isNotNull()),
        key=key,
        order_col=order[0],
    ).select(*key, F.col("prediction").alias("ForecastValue"))
    return PipelineResult(
        metrics=metrics, summary=metrics_summary(metrics), extra={"live_forecasts": live}
    )


def run_automate(
    events: DataFrame,
    params: dict | None = None,
    predict_fn: Callable[[DataFrame], DataFrame] = _default_predict,
    skip_training: bool = False,
    key=SERIES_KEY,
    order=("event_ts",),
    exact_split: bool = True,
    history_path: str | None = None,
) -> dict[str, PipelineResult]:
    """POST /automate analogue: sequential train → validate → test with
    the skip-training short-circuit (API:318-373). ``exact_split=False``
    runs the whole flow on the quantile-cutoff split (the scale path).

    With ``history_path`` set, the run consults the params history when
    ``params`` is absent (the reference's MLflow last-run fallback,
    API:124-150) and records the resolved params after — so a second
    parameterless run reproduces the first's configuration."""
    out: dict[str, PipelineResult] = {}
    if history_path is not None:
        if params is None:
            params = merge_params(
                None, None, last_run_params=load_last_run_params(history_path)
            )
        record_run_params(history_path, params)
    train_res = run_train(events, params=params, predict_fn=predict_fn, key=key,
                          order=order, exact_split=exact_split)
    if not skip_training:
        out["train"] = train_res
    out["validate"] = run_validate(events, train_res, predict_fn=predict_fn, key=key,
                                   order=order, exact_split=exact_split)
    out["test"] = run_test(events, train_res, predict_fn=predict_fn, key=key,
                           order=order, exact_split=exact_split)
    return out


def run_walk_forward(
    events: DataFrame,
    n_folds: int = 3,
    params: dict | None = None,
    predict_fn: Callable[[DataFrame], DataFrame] = _default_predict,
    key=SERIES_KEY,
    order=("event_ts",),
    exact: bool = True,
) -> list[PipelineResult]:
    """Rolling-origin (walk-forward) cross-validation — the form of CV
    that is VALID for chronological data (random k-fold would leak the
    future into training; the md5 k-fold assigner `emb_kfold_assign` is
    for i.i.d. corpora only).

    Fold i trains on everything before cutoff c_i and evaluates on
    [c_i, c_{i+1}), with cutoffs at fractions (i+1)/(n_folds+1) of the
    time axis. Each fold mirrors the train→validate contract exactly:
    routing and normalization parameters derive from the fold's TRAIN
    slice only and are applied to its eval slice (leakage-aware,
    VAL:258-287 semantics).

    Scale: cutoffs come from ONE approxQuantile job over the order
    column (``exact=True`` sets relativeError 0 — exact quantiles,
    still no global sort); fold slicing is a map-side filter, so k
    folds cost k filtered passes over the plan, never a shuffle of the
    raw events.
    """
    col = order[0]
    fracs = [(i + 1) / (n_folds + 1) for i in range(n_folds + 1)]
    us = events.select(F.unix_micros(F.col(col)).alias("_us"))
    cuts = us.approxQuantile("_us", fracs, 0.0 if exact else 0.01)

    results: list[PipelineResult] = []
    for i in range(n_folds):
        train = events.filter(F.unix_micros(F.col(col)) < cuts[i])
        ev = events.filter(
            (F.unix_micros(F.col(col)) >= cuts[i])
            & (F.unix_micros(F.col(col)) < cuts[i + 1])
        )
        feats = build_features(train, key=key, order=order)
        routing = model_routing(feats, key=key)
        feats = with_model_type(feats, routing, key=key)
        feats = with_min_max_normalized(feats, ["value"], key=key)
        norm_params = normalization_params(feats, ["value"], key=key)

        efeats = build_features(
            ev, key=key, order=order, fill_direction="bfill_then_ffill"
        )
        efeats = with_min_max_normalized(
            efeats, ["value"], key=key, params=norm_params
        )
        efeats = with_model_type(efeats, routing, key=key)
        scored = predict_fn(efeats)
        metrics = group_metrics(
            scored, actual_col="value", pred_col="prediction", key=key
        )
        results.append(
            PipelineResult(
                metrics=metrics,
                summary=metrics_summary(metrics),
                extra={"fold": i, "cutoff_us": cuts[i], "params": params or {}},
            )
        )
    return results
