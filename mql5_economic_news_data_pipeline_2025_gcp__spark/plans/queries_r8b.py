"""Round-8 batch b: tokenizer-economics and calibration operators.

Five additions a training-data platform reads before committing a
tokenizer or a forecast model, each oracle-paired and integer-first:

- ``doc_wordpiece_fertility`` — tokens-per-word (fertility) and
  continuation fraction PER SOURCE under the fixed WordPiece vocab:
  the number that prices a tokenizer change (fertility × corpus size
  = training tokens). Distinct-word segmentation joined back onto
  per-source word counts — the doc_wordpiece_segment scale shape.
- ``doc_ngram_coverage_curve`` — corpus bigram instances covered by
  the top-K distinct bigrams (K = 10/100/1000): the Zipf-head
  coverage readout that sizes n-gram LM / cache vocabularies.
- ``doc_vocab_pruning_oov`` — OOV instance rate under min-count
  vocabulary cuts (2/5/10): what a frequency-pruned vocab loses.
- ``evt_brier_decomposition`` — Murphy reliability / resolution /
  uncertainty decomposition of a binned forecast against realized
  outcomes, per-bin integer sufficient statistics plus identically-
  sequenced float terms.
- ``evt_ipf_raking_check`` — TWO iterative-proportional-fitting
  (raking) rounds on the (event_type × weekend) contingency table
  with milli-requantized weights — the survey-weighting iterative
  twin, same hand-off discipline as emb_lloyd_round2_check.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .queries_r6b import _WP_CHARS, _WP_VALUES, _WP_VOCAB
from .registry import register


@register(
    "doc_wordpiece_fertility",
    oracle=rf"""
    WITH RECURSIVE
    vocab(piece, raw, cont) AS (VALUES {_WP_VALUES}),
    toks AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    wcs AS (SELECT source, tok AS w, count(*) AS n FROM toks
            WHERE tok <> '' GROUP BY source, tok),
    words AS (SELECT DISTINCT w FROM wcs
              WHERE regexp_matches(w, '^[{_WP_CHARS}]+$')),
    seg AS (
      SELECT w.w, length(v.raw) AS consumed, v.cont
      FROM words w JOIN vocab v
        ON NOT v.cont AND substr(w.w, 1, length(v.raw)) = v.raw
      WHERE NOT EXISTS (
        SELECT 1 FROM vocab v2
        WHERE NOT v2.cont AND length(v2.raw) > length(v.raw)
          AND substr(w.w, 1, length(v2.raw)) = v2.raw)
      UNION ALL
      SELECT s.w, s.consumed + length(v.raw), v.cont
      FROM seg s JOIN vocab v
        ON v.cont
       AND substr(s.w, s.consumed + 1, length(v.raw)) = v.raw
      WHERE s.consumed < length(s.w)
        AND NOT EXISTS (
          SELECT 1 FROM vocab v2
          WHERE v2.cont AND length(v2.raw) > length(v.raw)
            AND substr(s.w, s.consumed + 1, length(v2.raw)) = v2.raw)),
    ws AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_pieces,
             CAST(sum(CASE WHEN cont THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cont
      FROM seg GROUP BY w),
    per AS (
      SELECT wcs.source, wcs.n,
             coalesce(ws.n_pieces, 1) AS n_pieces,
             coalesce(ws.n_cont, 0) AS n_cont
      FROM wcs LEFT JOIN ws ON ws.w = wcs.w)
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_words,
           CAST(sum(n * n_pieces) AS BIGINT) AS n_tokens,
           CAST(sum(n * n_cont) AS BIGINT) AS n_continuations,
           round(CAST(sum(n * n_pieces) AS DOUBLE) / sum(n), 6)
             AS fertility
    FROM per GROUP BY source
    """,
    description=(
        "tokenizer fertility per source under the fixed WordPiece "
        "vocab — tokens-per-word is THE number that prices a tokenizer "
        "change (fertility × word count = training tokens, and a "
        "source whose fertility spikes is one the vocab does not "
        "speak). Same scale shape as doc_wordpiece_segment: each "
        "DISTINCT in-alphabet word is segmented once (Arrow-batched "
        "greedy longest-match over the Zipf-bounded word frame; "
        "out-of-alphabet words count as one [UNK] piece), then piece/"
        "continuation counts join back onto the per-(source, word) "
        "count aggregate — token-scale work never leaves the JVM. "
        "Integer word/token/continuation sums; one final division "
        "per source. Oracle replays the greedy walk as a recursive "
        "CTE with NOT-EXISTS longest-match argmax"
    ),
    tags=("documents", "text", "tokenize"),
)
def doc_wordpiece_fertility(spark, sf_dir):
    import pandas as pd

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    wcs = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    words = (
        wcs.select(F.col("tok").alias("w"))
        .distinct()
        .filter(F.col("w").rlike(f"^[{_WP_CHARS}]+$"))
    )

    vocab = _WP_VOCAB
    charset = set(_WP_CHARS)

    def _stats(batches):
        for pdf in batches:
            out_w, out_p, out_c = [], [], []
            for w in pdf["w"]:
                if not set(w) <= charset:
                    # unreachable (pre-filtered) but keep the UNK rule
                    out_w.append(w)
                    out_p.append(1)
                    out_c.append(0)
                    continue
                pos, n_pieces, n_cont = 0, 0, 0
                while pos < len(w):
                    best = None
                    for piece, raw, cont in vocab:
                        if cont != (pos > 0):
                            continue
                        if w.startswith(raw, pos) and (
                            best is None or len(raw) > len(best[1])
                        ):
                            best = (piece, raw)
                    pos += len(best[1])
                    n_pieces += 1
                    n_cont += 1 if pos > len(best[1]) and best[0].startswith("##") else 0
                out_w.append(w)
                out_p.append(n_pieces)
                out_c.append(n_cont)
            if out_w:
                yield pd.DataFrame(
                    {"w": out_w, "n_pieces": out_p, "n_cont": out_c}
                )

    ws = words.mapInPandas(_stats, schema="w string, n_pieces long, n_cont long")
    per = wcs.join(ws, wcs.tok == ws.w, "left").select(
        "source",
        "n",
        F.coalesce(F.col("n_pieces"), F.lit(1)).alias("n_pieces"),
        F.coalesce(F.col("n_cont"), F.lit(0)).alias("n_cont"),
    )
    return per.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_words"),
        F.sum(F.col("n") * F.col("n_pieces")).cast("bigint").alias("n_tokens"),
        F.sum(F.col("n") * F.col("n_cont"))
        .cast("bigint")
        .alias("n_continuations"),
        F.round(
            F.sum(F.col("n") * F.col("n_pieces")).cast("double")
            / F.sum("n"),
            6,
        ).alias("fertility"),
    )


@register(
    "doc_ngram_coverage_curve",
    oracle=r"""
    WITH toks AS (
      SELECT string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
               AS lst
      FROM documents),
    bg AS (
      SELECT l AS w1, r AS w2 FROM (
        SELECT unnest(lst) AS l, unnest(lst[2:]) AS r FROM toks)
      WHERE r IS NOT NULL AND l <> '' AND r <> ''),
    gc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
           FROM bg GROUP BY w1, w2),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_distinct FROM gc),
    top AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, w1 ASC, w2 ASC) AS rk
      FROM gc
      ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1000),
    cov AS (
      SELECT CAST(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) AS BIGINT)
               AS cov10,
             CAST(sum(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT)
               AS cov100,
             CAST(sum(cnt) AS BIGINT) AS cov1000
      FROM top)
    SELECT t.total AS total_instances, t.n_distinct AS distinct_bigrams,
           c.cov10, c.cov100, c.cov1000,
           CAST(c.cov10 * 1000000 // t.total AS BIGINT) AS ppm10,
           CAST(c.cov100 * 1000000 // t.total AS BIGINT) AS ppm100,
           CAST(c.cov1000 * 1000000 // t.total AS BIGINT) AS ppm1000
    FROM tot t, cov c
    """,
    description=(
        "Zipf-head coverage curve: what fraction of all corpus bigram "
        "INSTANCES the top-10/100/1000 distinct bigrams cover — the "
        "readout that sizes an n-gram LM or phrase-cache vocabulary "
        "(flat curve = diverse corpus, steep = boilerplate-dominated; "
        "read next to doc_zipf_fit and doc_boilerplate_prefixes). "
        "Integer throughout: coverage emitted in exact ppm by integer "
        "floor-division (both operands non-negative, so Spark div == "
        "DuckDB //). Shape: one map-side bigram explode + count agg "
        "(shuffle = |distinct bigrams|), a TakeOrdered(1000) head — "
        "never a global sort of the histogram — and a ≤1000-row rank "
        "window; ties pinned (cnt DESC, w1, w2)"
    ),
    tags=("documents", "text", "statistics"),
)
def doc_ngram_coverage_curve(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    lst = F.split(
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
    )
    bg = (
        docs.select(lst.alias("lst"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(lst) >= 2 THEN transform("
                    "sequence(1, size(lst) - 1), "
                    "i -> struct(element_at(lst, i) AS w1, "
                    "element_at(lst, i + 1) AS w2)) ELSE array() END"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    gc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # histogram-sized frame feeds the total AND the head — derive once
    gc = gc.localCheckpoint()
    tot = gc.agg(
        F.sum("cnt").cast("bigint").alias("total_instances"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_bigrams"),
    )
    top = gc.orderBy(
        F.col("cnt").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(1000)
    w = Window.orderBy(F.col("cnt").desc(), F.col("w1").asc(), F.col("w2").asc())
    ranked = top.withColumn("rk", F.row_number().over(w))
    cov = ranked.agg(
        F.sum(F.when(F.col("rk") <= 10, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("cov10"),
        F.sum(F.when(F.col("rk") <= 100, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("cov100"),
        F.sum("cnt").cast("bigint").alias("cov1000"),
    )
    out = tot.crossJoin(cov)
    return out.select(
        "total_instances",
        "distinct_bigrams",
        "cov10",
        "cov100",
        "cov1000",
        F.expr("cov10 * 1000000 div total_instances").alias("ppm10"),
        F.expr("cov100 * 1000000 div total_instances").alias("ppm100"),
        F.expr("cov1000 * 1000000 div total_instances").alias("ppm1000"),
    )


@register(
    "doc_vocab_pruning_oov",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    wc AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks
           WHERE tok <> '' GROUP BY tok),
    th AS (SELECT unnest([2, 5, 10]) AS min_count)
    SELECT CAST(th.min_count AS BIGINT) AS min_count,
           CAST(count(CASE WHEN wc.freq >= th.min_count THEN 1 END)
                AS BIGINT) AS vocab_kept,
           CAST(sum(CASE WHEN wc.freq < th.min_count
                         THEN wc.freq ELSE 0 END) AS BIGINT)
             AS oov_instances,
           CAST(sum(wc.freq) AS BIGINT) AS total_instances,
           CAST(sum(CASE WHEN wc.freq < th.min_count
                         THEN wc.freq ELSE 0 END) * 1000000
                // sum(wc.freq) AS BIGINT) AS oov_ppm
    FROM wc, th
    GROUP BY th.min_count
    """,
    description=(
        "OOV cost of frequency-pruned vocabularies: for min-count "
        "cuts 2/5/10, how many token INSTANCES fall out of vocabulary "
        "and how many distinct types survive — the trade a vocab "
        "builder reads before pinning a threshold (each pruned type "
        "costs its full instance count in [UNK]s; Zipf's tail makes "
        "vocab_kept collapse much faster than oov_ppm grows). Exact "
        "integer ppm via floor division. Shape: ONE word-histogram "
        "aggregate (the same Zipf-bounded frame every tokenizer query "
        "rides) crossed with a 3-row literal threshold table — all "
        "thresholds answered in a single pass, no re-scan per cut"
    ),
    tags=("documents", "text", "tokenize"),
)
def doc_vocab_pruning_oov(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("tok")
    ).filter(F.col("tok") != "")
    wc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    th = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(2), F.lit(5), F.lit(10)), (F.col("id") + 1).cast("int"))
        .cast("bigint")
        .alias("min_count")
    )
    j = wc.crossJoin(F.broadcast(th))
    return j.groupBy("min_count").agg(
        F.count(F.when(F.col("freq") >= F.col("min_count"), 1))
        .cast("bigint")
        .alias("vocab_kept"),
        F.sum(
            F.when(F.col("freq") < F.col("min_count"), F.col("freq")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("oov_instances"),
        F.sum("freq").cast("bigint").alias("total_instances"),
    ).select(
        "min_count",
        "vocab_kept",
        "oov_instances",
        "total_instances",
        F.expr("oov_instances * 1000000 div total_instances").alias("oov_ppm"),
    )


@register(
    "evt_brier_decomposition",
    oracle="""
    WITH base AS (
      SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 3))
                  AS BIGINT) % 10 AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
      FROM events),
    cells AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o) AS BIGINT) AS s
      FROM base GROUP BY bin),
    g AS (
      SELECT bin, n, s,
             sum(n) OVER () AS nn, sum(s) OVER () AS ss
      FROM cells)
    SELECT bin, n, s,
           round(((2 * bin + 1) / 20.0 - CAST(s AS DOUBLE) / n)
                 * ((2 * bin + 1) / 20.0 - CAST(s AS DOUBLE) / n) * n, 6)
             AS rel_term,
           round((CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn)
                 * (CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn) * n, 6)
             AS res_term,
           round(CAST(ss AS DOUBLE) / nn
                 * (1 - CAST(ss AS DOUBLE) / nn), 6) AS uncertainty
    FROM g
    """,
    description=(
        "Murphy decomposition of the Brier score — reliability (is a "
        "'0.65 bin' right 65% of the time?), resolution (do bins "
        "separate outcomes?), uncertainty (base-rate entropy) — the "
        "calibration readout evt_calibration_bins feeds into a single "
        "quality verdict; REL−RES+UNC = Brier, so a forecaster is "
        "graded without ever scoring individual rows. The forecast "
        "here is a deterministic md5-derived decile score (the "
        "engine-portable stand-in for a model score column; bin k "
        "forecasts (2k+1)/20). Per-bin INTEGER sufficient statistics "
        "(n, s) carry all information; the three float terms are "
        "computed with identically-sequenced literal arithmetic in "
        "both engines (x*x, never pow). Shape: one map-side bin/"
        "outcome projection + a 10-row groupBy; totals window-lifted "
        "over the 10-row frame — the fact table is touched once"
    ),
    tags=("events", "statistics", "evaluation"),
)
def evt_brier_decomposition(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    base = ev.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 3), 16, 10)
            .cast("bigint")
            % 10
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("o"),
    )
    cells = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("o").cast("bigint").alias("s"),
    )
    w = Window.partitionBy()
    g = cells.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(w).alias("nn"),
        F.sum("s").over(w).alias("ss"),
    )
    p = (2 * F.col("bin") + 1) / F.lit(20.0)
    ob = F.col("s").cast("double") / F.col("n")
    obar = F.col("ss").cast("double") / F.col("nn")
    return g.select(
        "bin",
        "n",
        "s",
        F.round((p - ob) * (p - ob) * F.col("n"), 6).alias("rel_term"),
        F.round((ob - obar) * (ob - obar) * F.col("n"), 6).alias("res_term"),
        F.round(obar * (1 - obar), 6).alias("uncertainty"),
    )


@register(
    "evt_ipf_raking_check",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CASE WHEN EXTRACT(isodow FROM ts) >= 6 THEN 1 ELSE 0 END AS wk,
             event_id
      FROM events),
    cells AS (
      SELECT event_type, CAST(wk AS BIGINT) AS wk,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY event_type, wk),
    rt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS r
           FROM base WHERE event_id % 2 = 0 GROUP BY event_type),
    ct AS (SELECT CAST(wk AS BIGINT) AS wk, CAST(count(*) AS BIGINT) AS c
           FROM base WHERE event_id % 2 = 1 GROUP BY wk),
    m0 AS (
      SELECT c.event_type, c.wk, c.n, rt.r,
             sum(c.n * 1000) OVER (PARTITION BY c.event_type) AS mass0
      FROM cells c JOIN rt USING (event_type)),
    w1 AS (
      SELECT event_type, wk, n,
             CAST(round(1000 * (r * 1000.0) / mass0) AS BIGINT)
               AS w1
      FROM m0),
    m1 AS (
      SELECT w1.event_type, w1.wk, w1.n, w1.w1, ct.c,
             sum(w1.n * w1.w1) OVER (PARTITION BY w1.wk) AS mass1
      FROM w1 JOIN ct USING (wk)),
    w2 AS (
      SELECT event_type, wk, n, w1,
             CAST(round(w1 * (c * 1000.0) / mass1) AS BIGINT) AS w2
      FROM m1)
    SELECT event_type, wk, n, w1 AS w1_millis, w2 AS w2_millis,
           CAST(sum(n * w2) OVER (PARTITION BY event_type) AS BIGINT)
             AS row_mass2,
           CAST(sum(n * w2) OVER (PARTITION BY wk) AS BIGINT) AS col_mass2
    FROM w2
    """,
    description=(
        "two iterative-proportional-fitting (raking) rounds on the "
        "(event_type × weekend) contingency table, hash-checkable — "
        "the survey-weighting iterative twin: row targets are the "
        "even-event_id margins, column targets the odd-event_id "
        "margins (a held-out-split calibration, the standard raking "
        "setup), weights start at 1000 millis and each round is ONE "
        "identical IEEE multiply-divide-round per cell "
        "(milli-requantized iteration — the emb_lloyd_round2_check "
        "recipe), so the round-2 input is exact integers again and "
        "the ROUND HAND-OFF is what the differential gate pins. "
        "Emits both rounds' weights plus the achieved row/column "
        "masses after round 2 (window-lifted over the 10-cell frame) "
        "so the convergence step is visible. Shape: one fact pass "
        "for cells + two margin aggregates; everything after is "
        "10-row arithmetic"
    ),
    tags=("events", "statistics", "iterative"),
)
def evt_ipf_raking_check(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    iso_dow = F.when(F.dayofweek("ts") == 1, 7).otherwise(
        F.dayofweek("ts") - 1
    )
    base = ev.select(
        "event_type",
        F.when(iso_dow >= 6, 1).otherwise(0).cast("bigint").alias("wk"),
        "event_id",
    )
    cells = base.groupBy("event_type", "wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rt = (
        base.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    ct = (
        base.filter(F.col("event_id") % 2 == 1)
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wrow = Window.partitionBy("event_type")
    wcol = Window.partitionBy("wk")
    m0 = cells.join(rt, "event_type").withColumn(
        "mass0", F.sum(F.col("n") * 1000).over(wrow)
    )
    w1 = m0.select(
        "event_type",
        "wk",
        "n",
        F.round(1000 * (F.col("r") * F.lit(1000.0)) / F.col("mass0"), 0)
        .cast("bigint")
        .alias("w1"),
    )
    m1 = w1.join(ct, "wk").withColumn(
        "mass1", F.sum(F.col("n") * F.col("w1")).over(wcol)
    )
    w2 = m1.select(
        "event_type",
        "wk",
        "n",
        "w1",
        F.round(F.col("w1") * (F.col("c") * F.lit(1000.0)) / F.col("mass1"), 0)
        .cast("bigint")
        .alias("w2"),
    )
    return w2.select(
        "event_type",
        "wk",
        "n",
        F.col("w1").alias("w1_millis"),
        F.col("w2").alias("w2_millis"),
        F.sum(F.col("n") * F.col("w2")).over(wrow).cast("bigint").alias("row_mass2"),
        F.sum(F.col("n") * F.col("w2")).over(wcol).cast("bigint").alias("col_mass2"),
    )
