"""Per-series CUSUM change detection — the SEQUENTIAL drift monitor
(complement to the distributional PSI monitor `evt_psi_drift`): a
loop-carried recursion, so like DTW it genuinely earns a Python seam.

Statistic (tabular two-sided CUSUM over integer cents):

    s_hi[i] = max(0, s_hi[i-1] + (x[i] - mean) - slack)
    s_lo[i] = max(0, s_lo[i-1] - (x[i] - mean) - slack)

with ``mean`` the series' own integer-exact mean (Σcents / n — the
calibration pass is one aggregate) and slack/threshold in the same
cent units. A series flags when either side crosses the threshold;
the FIRST crossing index (1-based, ties impossible — the scan is
sequential) and the max statistics are reported.

Scale shape: identical to the DTW batch-carry contract — ONE shuffle
on the series key with sortWithinPartitions, then a single
``mapInPandas`` pass whose open-group tail carries across Arrow batch
boundaries (per-BATCH overhead, not per-group). Integer state only
(cents), so results are bit-identical to the pure-Python reference in
``test_cusum_matches_reference``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def cusum_scan(
    values: Sequence[int],
    mean_c: int,
    slack_c: int,
    threshold_c: int,
) -> tuple[int, int, int]:
    """Pure-integer CUSUM over one series (reference implementation —
    the mapInPandas form must match this exactly).

    Returns (max_s_hi, max_s_lo, first_alarm_idx) with idx 1-based and
    0 = no alarm. ``mean_c`` uses integer floor division of the exact
    cent sum, so every engine computes the identical calibration."""
    s_hi = s_lo = 0
    max_hi = max_lo = 0
    alarm = 0
    for i, x in enumerate(values, start=1):
        d = x - mean_c
        s_hi = max(0, s_hi + d - slack_c)
        s_lo = max(0, s_lo - d - slack_c)
        max_hi = max(max_hi, s_hi)
        max_lo = max(max_lo, s_lo)
        if alarm == 0 and (s_hi > threshold_c or s_lo > threshold_c):
            alarm = i
    return max_hi, max_lo, alarm


def series_cusum(
    df: DataFrame,
    slack_c: int = 50,
    threshold_c: int = 2000,
    key=("user_id", "event_type"),
    order_col: str = "event_id",
    value_col: str = "value_c",
) -> DataFrame:
    """Batch-carry CUSUM over every series: one shuffle on the key,
    groups contiguous via sortWithinPartitions, single mapInPandas
    pass with the open group's values carried across batches."""
    import numpy as np
    import pandas as pd

    key = list(key)
    # output schema follows the key parameter (key column types come
    # from the input frame), so non-default keys stay correctly labeled
    dtypes = dict(df.dtypes)
    stat_cols = ["n", "max_s_hi", "max_s_lo", "first_alarm_idx"]
    out_schema = ", ".join(
        [f"{k} {dtypes[k]}" for k in key] + [f"{c} long" for c in stat_cols]
    )
    narrow = df.select(*key, order_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    parts = narrow.repartition(*key).sortWithinPartitions(*key, order_col)

    def _finish(kv, vals):
        v = [int(x) for x in vals]
        mean_c = sum(v) // len(v)
        hi, lo, alarm = cusum_scan(v, mean_c, slack_c, threshold_c)
        return (*kv, len(v), hi, lo, alarm)

    def _reduce(batches):
        cols = [*key, *stat_cols]
        carry_key, carry_vals = None, []
        for pdf in batches:
            out = []
            vals = pdf[value_col].to_numpy(np.int64)
            keys = list(zip(*(pdf[k] for k in key)))
            i = 0
            while i < len(pdf):
                kv = keys[i]
                j = i
                while j < len(pdf) and keys[j] == kv:
                    j += 1
                group_vals = vals[i:j].tolist()
                if carry_key is not None and kv == carry_key:
                    group_vals = carry_vals + group_vals
                elif carry_key is not None:
                    out.append(_finish(carry_key, carry_vals))
                if j == len(pdf):
                    carry_key, carry_vals = kv, group_vals
                else:
                    out.append(_finish(kv, group_vals))
                    carry_key, carry_vals = None, []
                i = j
            if out:
                yield pd.DataFrame(out, columns=cols)
        if carry_key is not None:
            yield pd.DataFrame([_finish(carry_key, carry_vals)], columns=cols)

    return parts.mapInPandas(_reduce, schema=out_schema)
