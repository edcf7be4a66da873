"""Gates for the stateful streaming interval-union operator.

The drain-vs-batch hash equality runs in diffcheck/test_oracle; these
pin the MULTI-BATCH exactness claim — the merged-segment state yields
the exact union even when a later micro-batch back-fills an earlier
gap, the case where a running-max-end fold silently undercounts.
"""

from __future__ import annotations

import random

from mql5_economic_news_data_pipeline_2025_gcp__spark.streaming.stateful import (
    _merge_intervals,
)


def _brute_union_len(intervals):
    pts = set()
    for s, e in intervals:
        pts.update(range(s, e))
    return len(pts)


def test_merge_is_exact_union_under_any_split():
    rng = random.Random(13)
    for trial in range(50):
        ivs = [
            (s, s + rng.randint(1, 15))
            for s in (rng.randint(0, 120) for _ in range(12))
        ]
        want = _brute_union_len(ivs)
        # arbitrary split into "micro-batches" in arbitrary order
        rng.shuffle(ivs)
        cut = rng.randint(0, len(ivs))
        merged = _merge_intervals([], ivs[:cut])
        merged = _merge_intervals(merged, ivs[cut:])
        got = sum(e - s for s, e in merged)
        assert got == want, (trial, ivs)
        # segments are sorted and disjoint
        for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
            assert e1 < s2


def test_backfill_case_beats_maxend_fold():
    """Batch 1 delivers a LATE interval; batch 2 back-fills an earlier
    disjoint one that partially overlaps nothing processed yet. The
    naive fold (running max end, data processed in arrival order)
    undercounts; the merged-segment state does not."""
    b1 = [(100, 110)]
    b2 = [(0, 10), (105, 120)]
    merged = _merge_intervals(_merge_intervals([], b1), b2)
    assert sum(e - s for s, e in merged) == 10 + 20
    # the arrival-order max-end fold, for contrast: it DROPS the
    # back-filled (0, 10) entirely (start below the fold point)
    covered, max_end = 0, None
    for s, e in b1 + b2:
        if max_end is None or s > max_end:
            covered += e - s
        elif e > max_end:
            covered += e - max_end
        max_end = e if max_end is None else max(max_end, e)
    assert covered == 20  # undercounts by the back-filled segment
    assert sum(e - s for s, e in merged) == _brute_union_len(b1 + b2) == 30
