"""Distributed BPE merge training — the tokenizer-building step of an
LLM data pipeline, run where the data lives.

Classic BPE training (Sennrich et al. 2016) iterates: count adjacent
symbol pairs, merge the most frequent pair everywhere, repeat. The
industrial trick that makes this distributable is the same one the
original implementation uses: train on the WORD-FREQUENCY dictionary,
not the raw corpus. One corpus-sized aggregation compresses 100 TB of
text to a vocab-sized (word, freq) table (Zipf: |vocab| grows ~
sub-linearly in corpus size), and every subsequent round touches only
that table:

- pair counting  = explode adjacent symbol pairs weighted by word
  freq → map-side-combined sum agg on (left, right). Shuffle volume is
  |distinct pairs| ≤ |vocab| × avg word length — KBs, not TBs.
- argmax         = orderBy(count DESC, left, right).limit(1) — a
  deterministic 1-ROW collect per round (bounded by construction, the
  only driver traffic in the loop).
- merge apply    = a map-only higher-order-function fold over each
  word's symbol array (greedy left-to-right non-overlapping, exactly
  Sennrich's regex replace). No shuffle at all.

The vocab table is ``localCheckpoint``-ed every few rounds so the plan
does not grow with the number of merges (same discipline as the
connected-components loops in ``dedup.py``).

Determinism: ties on pair count break lexicographically on (left,
right) — byte order, identical in Python and Spark for the ASCII test
corpus — so the merge table is reproducible run to run and matches the
sequential reference implementation in tests token for token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) dictionary: the ONE corpus-sized aggregation."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _merge_fold(l: str, r: str, col: str = "s") -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (l, r) with the merged symbol, as a JVM-side aggregate() fold
    over the symbol array. Literals enter as bound parameters
    (``F.lit``), never by string interpolation — symbol text can hold
    quotes without breaking the expression."""
    merged = F.lit(l + r)

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(col, F.array().cast("array<string>"), step)


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int = 20,
    min_pair_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges over ``docs``; returns the merge
    table (rank, left, right, merged, pair_count) — the artifact a
    tokenizer ships. Stops early when the best pair drops under
    ``min_pair_count``."""
    wf = word_freqs(docs, text_col).withColumn(
        "s", F.expr("filter(split(word, ''), ch -> ch <> '')")
    )
    wf = wf.localCheckpoint()

    records: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pairs = (
            wf.filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, i) AS l, "
                        "element_at(s, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # deterministic argmax: 1 row to the driver per round (bounded
        # by construction — the loop's only driver traffic)
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).head(1)
        if not best or best[0]["cnt"] < min_pair_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        records.append((rank, l, r, l + r, cnt))
        wf = wf.withColumn("s", _merge_fold(l, r))
        if rank % checkpoint_every == 0:
            wf = wf.localCheckpoint()

    return spark.createDataFrame(
        records, "rank int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]], col: str = "s") -> DataFrame:
    """Apply a learned merge list to symbol arrays in priority order —
    the deterministic tokenizer the merge table defines. Map-only."""
    for l, r in merges:
        df = df.withColumn(col, _merge_fold(l, r, col))
    return df
