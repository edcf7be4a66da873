"""Property gates for the round-9b corpus-curation batch
(plans/queries_r9b.py): brute-force the character-gram entropy and the
blocklist pass from raw parquet rows in pure Python, and assemble the
conditional-entropy band check from the emitted integer stats.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000
_HALF = 1048576
_BLOCKLIST = ("slow", "dup", "legacy")


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_char_bigram_entropy_stats(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_char_bigram_entropy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    uni = defaultdict(Counter)
    big = defaultdict(Counter)
    for r in _docs().itertuples():
        txt = r.text
        if len(txt) < 2:
            continue
        uni[r.source].update(txt)
        big[r.source].update(txt[i : i + 2] for i in range(len(txt) - 1))
    assert set(got) == set(uni)
    for src in uni:
        row = got[src]
        nu, nb = sum(uni[src].values()), sum(big[src].values())
        assert int(row["n_uni"]) == nu
        assert int(row["n_big"]) == nb
        assert int(row["u_distinct"]) == len(uni[src])
        assert int(row["b_distinct"]) == len(big[src])

        def q(cnt):
            return sum(c * round(math.log(c) * _LN_U) for c in cnt.values())

        h1num = int(row["h1num_hi"]) * _HALF + int(row["h1num_lo"])
        h2num = int(row["h2num_hi"]) * _HALF + int(row["h2num_lo"])
        assert h1num == q(uni[src])
        assert h2num == q(big[src])
        # assembled entropies vs direct float reference
        h1 = math.log(nu) - h1num / (nu * _LN_U)
        h2 = math.log(nb) - h2num / (nb * _LN_U)
        h1_direct = -sum(
            (c / nu) * math.log(c / nu) for c in uni[src].values()
        )
        h2_direct = -sum(
            (c / nb) * math.log(c / nb) for c in big[src].values()
        )
        assert abs(h1 - h1_direct) < 1e-5
        assert abs(h2 - h2_direct) < 1e-5
        # conditional char entropy: 0 <= H2 - H1 <= H1 for natural text
        cond = h2 - h1
        assert -1e-6 <= cond <= h1 + 1e-6


def test_blocklist_filter_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_blocklist_filter"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    stats = defaultdict(lambda: [0, 0, 0, 0])  # docs, flagged, hits, kept
    for r in _docs().itertuples():
        hits = sum(1 for w in r.text.split(" ") if w in _BLOCKLIST)
        s = stats[r.source]
        s[0] += 1
        if hits:
            s[1] += 1
            s[2] += hits
        else:
            s[3] += int(r.n_chars)
    assert set(got) == set(stats)
    any_flagged = any_zero = False
    for src, (nd, nf, nh, kept) in stats.items():
        row = got[src]
        assert int(row["n_docs"]) == nd
        assert int(row["n_flagged"]) == nf
        assert int(row["blocked_instances"]) == nh
        assert int(row["kept_chars"]) == kept
        assert int(row["keep_rate_bp"]) == (nd - nf) * 10000 // nd
        any_flagged |= nf > 0
        any_zero |= nf == 0 or nf < nd
    # the corpus-matched list must exercise both outcome paths
    assert any_flagged and any_zero
    # 'legacy' never occurs: instances must come from real vocab only
    all_words = Counter(
        w for r in _docs().itertuples() for w in r.text.split(" ")
    )
    assert all_words.get("legacy", 0) == 0
