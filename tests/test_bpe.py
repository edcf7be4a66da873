"""BPE trainer vs a sequential pure-Python reference (Sennrich-style)."""

import collections
import re

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_freqs,
)

SF = "/root/testdata/sf0.001"


def _ref_word_freqs(texts):
    wf = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                wf[w] += 1
    return wf


def _ref_bpe(wf, num_merges, min_pair_count=2):
    """Sequential reference: symbol lists per word, full recount each
    round (the O(vocab) form of Sennrich's get_stats/merge_vocab)."""
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, num_merges + 1):
        stats = collections.Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        # deterministic argmax: max count, lexicographic tie-break
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, l, r, l + r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def texts(spark):
    return [
        r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("text")
        .collect()
    ]


def test_word_freqs_matches_reference(spark, texts):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == dict(_ref_word_freqs(texts))


def test_bpe_train_matches_sequential_reference(spark, texts):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(spark, docs, num_merges=12).orderBy("rank").collect()
    ]
    want, _ = _ref_bpe(_ref_word_freqs(texts), 12)
    assert got == want


def test_bpe_segment_matches_reference_vocab(spark, texts):
    """Applying the learned merges in priority order reproduces the
    reference trainer's final symbolization of every vocab word."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges_df = bpe_train(spark, docs, num_merges=8).orderBy("rank").collect()
    merges = [(r.left, r.right) for r in merges_df]
    _, ref_vocab = _ref_bpe(_ref_word_freqs(texts), 8)

    wf = word_freqs(docs).withColumn(
        "s",
        __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            "filter(split(word, ''), ch -> ch <> '')"
        ),
    )
    seg = bpe_segment(wf, merges)
    got = {r.word: list(r.s) for r in seg.collect()}
    assert got == ref_vocab


def test_bpe_early_stop_on_min_count(spark):
    docs = spark.createDataFrame(
        [("zq xv",), ("pk jw",)], "text string"
    )  # every adjacent pair occurs exactly once
    out = bpe_train(spark, docs, num_merges=5, min_pair_count=2)
    assert out.count() == 0
