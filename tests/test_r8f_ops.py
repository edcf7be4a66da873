"""Property gate for doc_span_corruption (plans/queries_r8f.py): a
pure-Python replay of the masking policy plus reconstruction
invariants (unmasked tokens survive in order; input+target jointly
carry every token exactly once).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _corrupt(doc_id, text):
    tk = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    n = len(tk)
    tg = [
        int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:4], 16) % 7 == 0
        for i in range(1, n + 1)
    ]
    mk = [
        tg[i] or (i >= 1 and tg[i - 1]) or (i >= 2 and tg[i - 2])
        for i in range(n)
    ]
    sp = [mk[i] and (i == 0 or not mk[i - 1]) for i in range(n)]
    masked, target = [], []
    for i in range(n):
        if not mk[i]:
            masked.append(tk[i])
        elif sp[i]:
            masked.append("<X>")
            target.append("<X> " + tk[i])
        else:
            target.append(tk[i])
    return (
        n,
        sum(sp),
        sum(mk),
        " ".join(masked),
        " ".join(target),
        tk,
        mk,
    )


def test_span_corruption_matches_pure_python(spark):
    got = (
        REGISTRY["doc_span_corruption"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for r in docs.itertuples():
        n, ns, nm, masked, target, tk, mk = _corrupt(int(r.doc_id), r.text)
        row = got.loc[int(r.doc_id)]
        assert (
            int(row["n_tokens"]),
            int(row["n_spans"]),
            int(row["n_masked"]),
        ) == (n, ns, nm)
        assert row["masked_text"] == masked
        assert row["target_text"] == target
        # reconstruction: every token appears exactly once across
        # input (unmasked) and target (masked), in order
        kept = [w for w in masked.split(" ") if w != "<X>" and w]
        cut = [w for w in target.replace("<X> ", "").split(" ") if w]
        assert kept == [t for t, m in zip(tk, mk) if not m]
        assert cut == [t for t, m in zip(tk, mk) if m]
