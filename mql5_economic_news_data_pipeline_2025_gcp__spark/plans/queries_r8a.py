"""Round-8 batch a: oracle twins for the remaining twin-less rows-only
operators (round-7 verdict task #2).

Five rows-only registry families gain hash-checkable differential twins
here, on the proven literal-artifact / integer-quantization recipes
(``queries_r7a`` template). Two of them verify the PRODUCTION operator
itself bit-exactly against an independent SQL engine — the strongest
form the registry has:

- ``doc_bpe_train3_check`` — runs the real ``operators.bpe.bpe_train``
  (3 merges) and re-derives the 3 rounds in pure SQL: the greedy
  left-to-right merge application is expressed as a literal
  ``replace`` over a double-space-delimited symbol string (the
  delimiter doubling makes non-overlapping replace EQUAL the fold's
  greedy semantics — a shared single delimiter is consumed by the
  match and breaks back-to-back merges).
- ``mm_phash_portable_check`` — runs the real Python ``phash_media``
  mapInPandas stage (md5 over payload byte 4-grams, majority-vote
  simhash) and recomputes the 64-bit signature in SQL from disjoint
  md5 hex windows (documents are pure ASCII, so byte windows ==
  character substrings); readout is the all-pairs integer Hamming
  histogram over a HARD-CAPPED id range (asset_id < 2048 — a twin
  bound, same convention as ALLPAIRS_MAX_ROWS).
- ``emb_pq_adc_check`` — product-quantization mechanics twin of the
  rows-only ``emb_pq_topk``: codebooks are data-derived but FIXED
  (the milli-quantized subvectors of vecs 0..3), encode = integer-L2
  argmin per subspace, ADC = integer table-lookup sum, top-10 readout.
- ``emb_knn_label_prop_check`` — label-propagation twin of the
  rows-only ``emb_knn_communities``: integer-L2 k-NN graph over a
  bounded node set (vec_id < 256), 3 synchronous LPA rounds with the
  production tie rule (most frequent label, ties to the smallest).
- ``evt_sketch_portable_profile`` — twin of ``evt_sketch_profile``
  (whose HLL++/KLL binaries are engine-specific): portable m=256 HLL
  registers (the evt_hll_portable_rollup recipe) + EXACT cumulative-
  histogram p50/p99 with cross-multiplied integer rank tests.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register


@register(
    "doc_bpe_train3_check",
    oracle="""
    WITH w0 AS (
      SELECT CAST(count(*) AS BIGINT) AS freq,
             '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS s
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                     AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word),
    p1 AS (
      SELECT freq, unnest(lst) AS l, unnest(lst[2:]) AS r
      FROM (SELECT freq, string_split(trim(s), '  ') AS lst FROM w0)),
    c1 AS (SELECT l, r, sum(freq) AS cnt FROM p1
           WHERE r IS NOT NULL GROUP BY l, r),
    b1 AS (SELECT l, r, cnt FROM c1 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    w1 AS (
      SELECT freq,
             replace(s, ' ' || (SELECT l FROM b1) || '  '
                          || (SELECT r FROM b1) || ' ',
                        ' ' || (SELECT l || r FROM b1) || ' ') AS s
      FROM w0),
    p2 AS (
      SELECT freq, unnest(lst) AS l, unnest(lst[2:]) AS r
      FROM (SELECT freq, string_split(trim(s), '  ') AS lst FROM w1)),
    c2 AS (SELECT l, r, sum(freq) AS cnt FROM p2
           WHERE r IS NOT NULL GROUP BY l, r),
    b2 AS (SELECT l, r, cnt FROM c2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    w2 AS (
      SELECT freq,
             replace(s, ' ' || (SELECT l FROM b2) || '  '
                          || (SELECT r FROM b2) || ' ',
                        ' ' || (SELECT l || r FROM b2) || ' ') AS s
      FROM w1),
    p3 AS (
      SELECT freq, unnest(lst) AS l, unnest(lst[2:]) AS r
      FROM (SELECT freq, string_split(trim(s), '  ') AS lst FROM w2)),
    c3 AS (SELECT l, r, sum(freq) AS cnt FROM p3
           WHERE r IS NOT NULL GROUP BY l, r),
    b3 AS (SELECT l, r, cnt FROM c3 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
    SELECT CAST(1 AS INTEGER) AS rank, l AS "left", r AS "right",
           l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b1
    UNION ALL SELECT 2, l, r, l || r, CAST(cnt AS BIGINT) FROM b2
    UNION ALL SELECT 3, l, r, l || r, CAST(cnt AS BIGINT) FROM b3
    """,
    description=(
        "the PRODUCTION BPE trainer verified bit-exactly against an "
        "independent engine: runs operators.bpe.bpe_train for 3 merge "
        "rounds (the real pair-count agg + 1-row argmax + greedy "
        "merge-fold loop) while the oracle unrolls the same 3 rounds "
        "in pure SQL — the word dictionary as a double-space-delimited "
        "symbol string, each round's merge applied with one literal "
        "replace() (delimiter doubling makes left-to-right non-"
        "overlapping replace EQUAL the fold's greedy semantics even "
        "for back-to-back pairs like 'a a a a' → 'aa aa'), argmax ties "
        "broken (count DESC, left, right) identically. Proves the "
        "round HAND-OFF — round k's merge reshapes round k+1's pair "
        "counts — which the sequential-reference pytest already pins "
        "for 20 merges; this puts the first 3 under the differential "
        "gate too. Shape: identical to doc_bpe_train_merges at 3 "
        "rounds (vocab-sized aggs, 1-row argmax collects)"
    ),
    tags=("documents", "text", "tokenizer"),
)
def doc_bpe_train3_check(spark, sf_dir):
    from ..operators.bpe import bpe_train

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    return bpe_train(spark, docs, num_merges=3)


@register(
    "mm_phash_portable_check",
    oracle="""
    WITH media AS (
      SELECT doc_id AS asset_id, text FROM documents WHERE doc_id < 2048),
    win AS (
      SELECT asset_id, md5(substring(text, i, 4)) AS dg
      FROM media, unnest(range(1, length(text) - 2)) AS u(i)
      WHERE length(text) >= 4),
    hw AS (
      SELECT asset_id,
             ('0x' || substring(dg, 1, 8))::BIGINT AS hi,
             ('0x' || substring(dg, 9, 8))::BIGINT AS lo
      FROM win),
    bits AS (
      SELECT asset_id, b.j,
             sum(CASE WHEN b.j < 32 THEN (lo >> b.j) & 1
                      ELSE (hi >> (b.j - 32)) & 1 END) AS ones,
             count(*) AS n
      FROM hw, (SELECT unnest(range(0, 64)) AS j) b
      GROUP BY asset_id, b.j),
    sig0 AS (
      SELECT asset_id,
             CAST(sum(CASE WHEN 2 * ones <= n THEN 0
                           WHEN j = 63 THEN -9223372036854775808
                           ELSE CAST(1 AS BIGINT) << j END) AS BIGINT) AS ph
      FROM bits GROUP BY asset_id),
    sig AS (
      SELECT m.asset_id, coalesce(s.ph, 0) AS ph
      FROM media m LEFT JOIN sig0 s USING (asset_id))
    SELECT CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM sig a JOIN sig b ON a.asset_id < b.asset_id
    GROUP BY 1
    """,
    description=(
        "the PRODUCTION perceptual-hash Python stage verified "
        "bit-exactly against SQL: runs the real phash_media "
        "mapInPandas operator (hashlib.md5 over payload byte 4-grams, "
        "majority vote per bit, two's-complement 64-bit signature) "
        "while the oracle rebuilds every signature from md5 hex "
        "windows (payloads are utf-8 text and the corpus is pure "
        "ASCII, so byte windows == character substrings; bits 0..31 "
        "from the low 8 hex chars, 32..63 from the high 8; majority = "
        "2·ones > n; bit 63 enters as −2^63). Readout is the integer "
        "Hamming histogram over ALL pairs of a hard-capped id range "
        "(asset_id < 2048 — a twin bound ≤ 2.1M pairs by construction, "
        "same convention as ALLPAIRS_MAX_ROWS; production pairing "
        "stays banded/pigeonhole). This is the calibration curve that "
        "picks the near-dup radius — and a bit-exact cross-engine "
        "check of the only Python hash stage in the multimodal path"
    ),
    tags=("multimodal", "dedup", "sketch"),
)
def mm_phash_portable_check(spark, sf_dir):
    from ..operators.multimodal import documents_as_media, phash_media

    docs = fan_out(spark, t(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 2048
    )
    # asset-count-sized (id, hash) rows; both self-join sides read it, so
    # materialize once — without this the Python md5-window stage runs
    # twice (2 Arrow seams measured)
    hashed = phash_media(documents_as_media(docs)).localCheckpoint()
    a = hashed.select(F.col("asset_id").alias("ia"), F.col("phash").alias("ha"))
    b = hashed.select(F.col("asset_id").alias("ib"), F.col("phash").alias("hb"))
    return (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(F.col("hamming").cast("bigint").alias("hamming"), "n_pairs")
    )


#: shared milli-quantized component CTE (the r6/r7a vector recipe).
_SQL_VE = """
    ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings)
"""


@register(
    "emb_pq_adc_check",
    oracle=f"""
    WITH {_SQL_VE},
    cb AS (SELECT vec_id AS cid, (idx - 1) // 8 AS s, idx, x
           FROM ve WHERE vec_id < 4),
    q AS (SELECT idx, x FROM ve WHERE vec_id = 4),
    corp AS (SELECT vec_id, idx, x FROM ve WHERE vec_id >= 8),
    vd AS (
      SELECT v.vec_id, c.s, c.cid, sum((v.x - c.x) * (v.x - c.x)) AS d2
      FROM corp v JOIN cb c ON c.idx = v.idx
      GROUP BY v.vec_id, c.s, c.cid),
    code AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2 ASC, cid ASC) AS rk
        FROM vd) WHERE rk = 1),
    qd AS (
      SELECT c.cid, c.s, sum((q.x - c.x) * (q.x - c.x)) AS qd2
      FROM q JOIN cb c ON c.idx = q.idx
      GROUP BY c.cid, c.s),
    adc AS (
      SELECT code.vec_id, CAST(sum(qd.qd2) AS BIGINT) AS adc_d2
      FROM code JOIN qd ON qd.s = code.s AND qd.cid = code.cid
      GROUP BY code.vec_id),
    top AS (
      SELECT vec_id AS neighbor_id, adc_d2
      FROM adc ORDER BY adc_d2 ASC, vec_id ASC LIMIT 10)
    SELECT CAST(row_number() OVER (ORDER BY adc_d2 ASC, neighbor_id ASC)
                AS BIGINT) AS rank,
           neighbor_id, adc_d2
    FROM top
    """,
    description=(
        "product-quantization ADC mechanics, hash-checkable — the "
        "oracle twin of the rows-only emb_pq_topk (whose codebooks are "
        "iteratively fit driver-side): codebooks are FIXED as the "
        "milli-quantized 8-dim subvectors of vecs 0..3 (m=8 subspaces "
        "× k=4 codewords — data-derived but deterministic, the "
        "lloyd-seed convention), encode = integer-L2 argmin per "
        "(vector, subspace) with ties to the lower code, and the "
        "asymmetric distance to query vec 4 is the integer "
        "table-lookup sum Σ_s qd2[s, code(v,s)] — exactly pq.py's "
        "scoring loop (argmin encode, per-query lookup rows, integer "
        "adds; zero float math). Shape: one |corpus|×4 broadcast "
        "assignment pass, a 32-row lookup broadcast-joined back, "
        "TakeOrdered(10) readout — never a global sort"
    ),
    tags=("embeddings", "similarity", "pq"),
)
def emb_pq_adc_check(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    cb = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    qrow = emb.filter(F.col("vec_id") == 4).select(F.col("qv").alias("qq"))
    corp = emb.filter(F.col("vec_id") >= 8)
    # per (vector, codeword): all 8 subspace distances in one projection
    sub = lambda c, s: F.slice(c, s * 8 + 1, 8)  # noqa: E731
    vd = corp.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "cid",
        *[
            _int_d2_arr(sub(F.col("qv"), s), sub(F.col("cv"), s)).alias(f"d{s}")
            for s in range(8)
        ],
    )
    # encode: integer-L2 argmin per subspace, ties to the lower code —
    # min(struct(d2, cid)) is a hash aggregate, no per-vector sort
    code = vd.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{s}").alias("d"), F.col("cid").alias("c")))
            .getField("c")
            .alias(f"c{s}")
            for s in range(8)
        ]
    )
    # per-query lookup table: 32 (s, cid, qd2) rows, broadcast back
    qd = cb.crossJoin(F.broadcast(qrow)).select(
        "cid",
        *[
            _int_d2_arr(sub(F.col("qq"), s), sub(F.col("cv"), s)).alias(
                f"q{s}"
            )
            for s in range(8)
        ],
    )
    qd_long = qd.select(
        "cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"), F.col(f"q{s}").alias("qd2")
                    )
                    for s in range(8)
                ]
            )
        ).alias("e"),
    ).select("cid", F.col("e.s").alias("s"), F.col("e.qd2").alias("qd2"))
    code_long = code.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"c{s}").alias("cid"))
                    for s in range(8)
                ]
            )
        ).alias("e"),
    ).select("vec_id", F.col("e.s").alias("s"), F.col("e.cid").alias("cid"))
    adc = (
        code_long.join(F.broadcast(qd_long), ["s", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    top = adc.orderBy(F.col("adc_d2").asc(), F.col("vec_id").asc()).limit(10)
    w = Window.orderBy(F.col("adc_d2").asc(), F.col("neighbor_id").asc())
    return (
        top.select(F.col("vec_id").alias("neighbor_id"), "adc_d2")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("rank", "neighbor_id", "adc_d2")
    )


@register(
    "emb_knn_label_prop_check",
    oracle=f"""
    WITH {_SQL_VE},
    nv AS (SELECT vec_id, idx, x FROM ve WHERE vec_id < 256),
    d AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             sum((a.x - b.x) * (a.x - b.x)) AS d2
      FROM nv a JOIN nv b ON a.idx = b.idx AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY d2 ASC, dst ASC) AS rk
        FROM d) WHERE rk <= 4),
    edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    r1 AS (SELECT e.src, l.label, count(*) AS n
           FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY e.src, l.label),
    l1 AS (SELECT src AS node, label FROM (
             SELECT src, label,
                    row_number() OVER (PARTITION BY src
                                       ORDER BY n DESC, label ASC) AS rk
             FROM r1) WHERE rk = 1),
    r2 AS (SELECT e.src, l.label, count(*) AS n
           FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY e.src, l.label),
    l2 AS (SELECT src AS node, label FROM (
             SELECT src, label,
                    row_number() OVER (PARTITION BY src
                                       ORDER BY n DESC, label ASC) AS rk
             FROM r2) WHERE rk = 1),
    r3 AS (SELECT e.src, l.label, count(*) AS n
           FROM edges e JOIN l2 l ON l.node = e.dst GROUP BY e.src, l.label),
    l3 AS (SELECT src AS node, label FROM (
             SELECT src, label,
                    row_number() OVER (PARTITION BY src
                                       ORDER BY n DESC, label ASC) AS rk
             FROM r3) WHERE rk = 1)
    SELECT CAST(label AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members
    FROM l3 GROUP BY label
    """,
    description=(
        "label-propagation mechanics, hash-checkable — the oracle twin "
        "of the rows-only emb_knn_communities (whose float-cosine k-NN "
        "graph has no cross-engine form): the k=4 NN graph is built on "
        "EXACT integer L2 over milli-quantized vectors of a bounded "
        "node set (vec_id < 256 — a twin bound; production uses the "
        "bucketed-ANN path), symmetrized, then 3 synchronous LPA "
        "rounds with the production update rule — every node adopts "
        "its neighbors' plurality label, ties to the SMALLEST label "
        "(max(struct(n, −label)) Spark-side == ORDER BY n DESC, label "
        "ASC oracle-side). Proves the round hand-off and the tie rule, "
        "the two places a distributed LPA silently diverges. Shape per "
        "round: edges ⋈ labels broadcast, (src,label) count agg, "
        "argmax — the production loop's exact per-round plan"
    ),
    tags=("embeddings", "graph", "iterative", "communities"),
)
def emb_knn_label_prop_check(spark, sf_dir):
    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 256)
        .select("vec_id", _qvec().alias("qv"))
    )
    a = emb.select(F.col("vec_id").alias("src"), F.col("qv").alias("va"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("qv").alias("vb"))
    d = (
        a.join(F.broadcast(b), F.col("src") != F.col("dst"))
        .select("src", "dst", _int_d2_arr(F.col("va"), F.col("vb")).alias("d2"))
    )
    wk = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
    knn = (
        d.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 4)
        .select("src", "dst")
    )
    edges = (
        knn.unionByName(
            knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()  # feeds all 3 rounds — node-bounded, tiny
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(3):
        nbr = edges.join(
            F.broadcast(labels), edges.dst == labels.node
        ).select("src", "label")
        counts = nbr.groupBy("src", "label").agg(F.count(F.lit(1)).alias("n"))
        best = counts.groupBy("src").agg(
            F.max(
                F.struct(F.col("n"), (-F.col("label")).alias("neg"))
            ).alias("m")
        )
        labels = best.select(
            F.col("src").alias("node"), (-F.col("m.neg")).alias("label")
        ).localCheckpoint()
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    ).select(
        F.col("label").cast("bigint").alias("community"), "n_members"
    )


@register(
    "evt_hll_portable_overlap",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM (SELECT DISTINCT event_type, user_id FROM events)),
    r AS (
      SELECT event_type, hv % 256 AS bucket,
             max(CASE WHEN hv // 256 = 0 THEN 25
                      ELSE 25 - length(bin(hv // 256)) END) AS reg
      FROM h GROUP BY event_type, bucket),
    s AS (
      SELECT event_type,
             CAST(sum(CAST(1 AS BIGINT) << (25 - reg))
                  + (256 - count(*)) * 33554432 AS BIGINT) AS sum_scaled,
             CAST(count(*) AS BIGINT) AS nb
      FROM r GROUP BY event_type),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type),
    types AS (SELECT DISTINCT event_type FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM types a JOIN types b ON a.event_type < b.event_type),
    m AS (
      SELECT p.type_a, p.type_b, r.bucket, max(r.reg) AS reg
      FROM pairs p
      JOIN r ON r.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, r.bucket),
    su AS (
      SELECT type_a, type_b,
             CAST(sum(CAST(1 AS BIGINT) << (25 - reg))
                  + (256 - count(*)) * 33554432 AS BIGINT)
               AS sum_scaled_union
      FROM m GROUP BY type_a, type_b)
    SELECT su.type_a, su.type_b,
           ea.n_exact AS n_a_exact, eb.n_exact AS n_b_exact,
           sa.sum_scaled AS sum_scaled_a, sb.sum_scaled AS sum_scaled_b,
           su.sum_scaled_union,
           round(1579498136381.3938 / sa.sum_scaled
                 + 1579498136381.3938 / sb.sum_scaled
                 - 1579498136381.3938 / su.sum_scaled_union, 2)
             AS est_overlap
    FROM su
    JOIN s sa ON sa.event_type = su.type_a
    JOIN s sb ON sb.event_type = su.type_b
    JOIN ex ea ON ea.event_type = su.type_a
    JOIN ex eb ON eb.event_type = su.type_b
    """,
    description=(
        "engine-portable HLL audience overlap — the oracle twin of "
        "evt_hll_audience_overlap (whose DataSketches binaries are "
        "engine-specific): per-type m=256 register tables from md5-"
        "prefix hashes, pairwise UNION computed the way sketches "
        "actually merge — elementwise register MAX (the mergeability "
        "property itself, here as a groupBy(pair, bucket) max over "
        "each pair's two register sets) — and inclusion-exclusion "
        "est(A)+est(B)−est(A∪B) with every harmonic denominator kept "
        "EXACT in BIGINT; the only floats are three identical-literal "
        "divisions combined left-to-right (bit-equal both engines). "
        "Register/union state emitted alongside so the differential "
        "gate pins the MERGE, not just the estimate. Shape: one "
        "distinct pass folds to ≤ types·256 register rows; the "
        "pairwise stage touches register tables only — cost "
        "independent of user cardinality, exactly like the production "
        "sketch path"
    ),
    tags=("events", "sketch", "set", "overlap"),
)
def evt_hll_portable_overlap(spark, sf_dir):
    from ..operators.dedup import _base_hash

    M, WBITS = 256, 25
    NUM = 1579498136381.3938
    ev = keyed_events(spark, sf_dir)
    u = ev.select("event_type", "user_id").distinct()
    h = u.select(
        "event_type", _base_hash(F.col("user_id").cast("string")).alias("hv")
    )
    w = F.floor(F.col("hv") / M).cast("bigint")
    rho = F.when(w == 0, F.lit(WBITS)).otherwise(
        F.lit(WBITS) - F.length(F.bin(w))
    )
    r = (
        h.groupBy("event_type", (F.col("hv") % M).alias("bucket"))
        .agg(F.max(rho).alias("reg"))
        # ≤ types·256 rows; feeds the singles fold AND the pair union
        .localCheckpoint()
    )

    def fold(df, keys):
        return df.groupBy(*keys).agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - reg)"))
                + (F.lit(M) - F.count(F.lit(1))) * F.lit(1 << WBITS)
            )
            .cast("bigint")
            .alias("sum_scaled")
        )

    s = fold(r, ["event_type"])
    # n_exact rides the SAME distinct lineage as the registers (h is
    # 1:1 with the distinct (type, user) pairs), not a second
    # count_distinct expand over the raw fact table
    ex = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    types = r.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            F.broadcast(types.select(F.col("event_type").alias("type_b"))),
            F.col("type_a") < F.col("type_b"),
        )
        # 2 membership rows per pair → the union join stays an equi-join
        .select(
            "type_a",
            "type_b",
            F.explode(F.array(F.col("type_a"), F.col("type_b"))).alias(
                "member"
            ),
        )
    )
    m = (
        pairs.join(F.broadcast(r), pairs.member == r.event_type)
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    su = fold(m, ["type_a", "type_b"]).withColumnRenamed(
        "sum_scaled", "sum_scaled_union"
    )
    sa = s.select(
        F.col("event_type").alias("type_a"),
        F.col("sum_scaled").alias("sum_scaled_a"),
    )
    sb = s.select(
        F.col("event_type").alias("type_b"),
        F.col("sum_scaled").alias("sum_scaled_b"),
    )
    ea = ex.select(
        F.col("event_type").alias("type_a"), F.col("n_exact").alias("n_a_exact")
    )
    eb = ex.select(
        F.col("event_type").alias("type_b"), F.col("n_exact").alias("n_b_exact")
    )
    return (
        su.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a_exact",
            "n_b_exact",
            "sum_scaled_a",
            "sum_scaled_b",
            "sum_scaled_union",
            F.round(
                F.lit(NUM) / F.col("sum_scaled_a")
                + F.lit(NUM) / F.col("sum_scaled_b")
                - F.lit(NUM) / F.col("sum_scaled_union"),
                2,
            ).alias("est_overlap"),
        )
    )


@register(
    "evt_sketch_portable_profile",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM (SELECT DISTINCT event_type, user_id FROM events)),
    b AS (SELECT event_type, hv % 256 AS bucket, hv // 256 AS w FROM h),
    r AS (
      SELECT event_type, bucket,
             max(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS reg
      FROM b GROUP BY event_type, bucket),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(CAST(1 AS BIGINT) << (25 - reg)) AS BIGINT)
               AS sum_present
      FROM r GROUP BY event_type),
    hll AS (
      SELECT event_type,
             CAST(256 - n_buckets AS BIGINT) AS zero_registers,
             CAST(sum_present + (256 - n_buckets) * 33554432 AS BIGINT)
               AS sum_scaled,
             round(1579498136381.3938
                   / (sum_present + (256 - n_buckets) * 33554432), 6)
               AS hll_users
      FROM agg),
    vc AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_c,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, value_c),
    cum AS (
      SELECT event_type, value_c, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY value_c) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS tot
      FROM vc),
    pct AS (
      SELECT event_type,
             CAST(min(CASE WHEN 2 * cc >= tot THEN value_c END) AS BIGINT)
               AS p50_c,
             CAST(min(CASE WHEN 100 * cc >= 99 * tot THEN value_c END)
                  AS BIGINT) AS p99_c,
             CAST(max(tot) AS BIGINT) AS n_valued
      FROM cum GROUP BY event_type)
    SELECT p.event_type, p.n_valued, p.p50_c, p.p99_c,
           l.zero_registers, l.sum_scaled, l.hll_users
    FROM pct p JOIN hll l USING (event_type)
    """,
    description=(
        "the engine-portable twin of evt_sketch_profile (whose HLL++ "
        "and KLL binaries are engine-specific by design): per "
        "event_type, (1) distinct-user estimate from a from-scratch "
        "m=256 HLL register table (the evt_hll_portable_rollup recipe: "
        "rho via the bin()-length trick, harmonic denominator EXACT as "
        "Σ 2^(25−reg) in BIGINT, one shared-literal division at the "
        "end), and (2) EXACT p50/p99 of value cents from the value "
        "histogram with CROSS-MULTIPLIED integer rank tests (2·cum ≥ "
        "n, 100·cum ≥ 99·n — no float ranks, no boundary drift) — the "
        "exact answers the production approx_percentile sketch is "
        "tolerance-gated against. Shape: one distinct-(type,user) "
        "pass folding to ≤ types·256 register rows, one value-"
        "histogram agg with windows on the HISTOGRAM (never raw "
        "facts) — both map-side-combined, both mergeable artifacts"
    ),
    tags=("events", "sketch", "aggregate"),
)
def evt_sketch_portable_profile(spark, sf_dir):
    from ..operators.dedup import _base_hash

    M, WBITS = 256, 25
    NUM = 1579498136381.3938  # 0.7213/(1+1.079/256) * 256^2 * 2^25
    ev = keyed_events(spark, sf_dir)
    u = ev.select("event_type", "user_id").distinct()
    h = u.select(
        "event_type", _base_hash(F.col("user_id").cast("string")).alias("hv")
    )
    b = h.select(
        "event_type",
        (F.col("hv") % M).alias("bucket"),
        F.floor(F.col("hv") / M).cast("bigint").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(WBITS)).otherwise(
        F.lit(WBITS) - F.length(F.bin("w"))
    )
    r = b.groupBy("event_type", "bucket").agg(F.max(rho).alias("reg"))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - reg)"))
        .cast("bigint")
        .alias("sum_present"),
    )
    hll = agg.select(
        "event_type",
        (F.lit(M) - F.col("n_buckets")).cast("bigint").alias("zero_registers"),
        (
            F.col("sum_present")
            + (F.lit(M) - F.col("n_buckets")) * F.lit(1 << WBITS)
        )
        .cast("bigint")
        .alias("sum_scaled"),
    ).withColumn(
        "hll_users", F.round(F.lit(NUM) / F.col("sum_scaled"), 6)
    )
    vc = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", "value_c")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("event_type").orderBy("value_c")
    wall = Window.partitionBy("event_type")
    cum = vc.select(
        "event_type",
        "value_c",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("tot"),
    )
    pct = cum.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("cc") >= F.col("tot"), F.col("value_c")))
        .cast("bigint")
        .alias("p50_c"),
        F.min(
            F.when(100 * F.col("cc") >= 99 * F.col("tot"), F.col("value_c"))
        )
        .cast("bigint")
        .alias("p99_c"),
        F.max("tot").cast("bigint").alias("n_valued"),
    )
    return pct.join(hll, "event_type").select(
        "event_type",
        "n_valued",
        "p50_c",
        "p99_c",
        "zero_registers",
        "sum_scaled",
        "hll_users",
    )
