"""Round-12c batch: ROUGE-L (LCS) pair similarity and the Hopkins
clustering-tendency statistic.

``doc_lcs_rouge`` — exact longest-common-subsequence length and the
ROUGE-L F measure between each source's two earliest documents (the
"consecutive crawl snapshots of one source" alignment a curation
pipeline diffs): the eval-metric companion to the edit-distance
verifier ``doc_levenshtein_verify``. The DP runs as Arrow-batched
Python (``mapInPandas``) over one bounded row per source — tokens are
capped at the first 24, so each cell grid is ≤ 24×24 and a row costs
microseconds; at 100 TB the same operator verifies LSH candidate pairs
(cap per pair unchanged, row count = candidate count). The DuckDB
oracle replays the IDENTICAL DP as a recursive CTE walking
anti-diagonals (the ``evt_dtw_check`` discipline: cells on diagonal
d+1 read left/up from d and diag from d−1, so carrying one diagonal
forward keeps both available) — LCS lengths are exact integers, so the
driver hash-checks a dynamic program across two engines.

``emb_hopkins_statistic`` — clustering tendency of the embedding
corpus: H = Σu/(Σu+Σw) over squared nearest-neighbor distances, where
u = NN distances of 32 deterministic SYNTHETIC probes (md5-derived
coordinates inside the per-dimension bounding box) and w = NN distances
of 32 md5-chosen REAL points (self excluded), both against a 256-point
md5-sampled reference set. H ≈ 0.5 says uniform (no cluster structure
for k-means/IVF to exploit); H → 1 says clustered. Coordinates are
milli-int quantized, distances exact BIGINTs; the md5 sampling and the
probe-coordinate hash replay bit-for-bit in SQL. All frames are
CAP-bounded (256·64 reference cells, 64·32·256 distance rows) no
matter the corpus size — the deterministic analogue of the random
Hopkins sample.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, t
from .registry import register

_LCS_CAP = 24
_N_REF = 256
_N_PROBE = 32


@register(
    "doc_lcs_rouge",
    oracle=r"""
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             list_filter(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
               w -> w <> '')[1:24] AS tk,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    pairs AS (
      SELECT a.source, a.tk AS tka, b.tk AS tkb,
             len(a.tk) AS n, len(b.tk) AS m
      FROM d a JOIN d b ON b.source = a.source AND a.rn = 1 AND b.rn = 2
      WHERE len(a.tk) >= 1 AND len(b.tk) >= 1),
    ta AS (
      SELECT source, unnest(tka) AS tok, generate_subscripts(tka, 1) AS i
      FROM pairs),
    tb AS (
      SELECT source, unnest(tkb) AS tok, generate_subscripts(tkb, 1) AS j
      FROM pairs),
    maxd AS (SELECT max(n + m) AS dmax FROM pairs),
    dp(source, d, i, j, val) AS (
      SELECT p.source, 2, 1, 1,
             CASE WHEN a.tok = b.tok THEN 1 ELSE 0 END
      FROM pairs p
      JOIN ta a ON a.source = p.source AND a.i = 1
      JOIN tb b ON b.source = p.source AND b.j = 1
      UNION ALL
      SELECT * FROM (
        SELECT a.source AS source, cur.d + 1 AS d, a.i AS i, b.j AS j,
               CASE WHEN a.tok = b.tok
                    THEN coalesce(max(CASE WHEN nb.i = a.i - 1
                                            AND nb.j = b.j - 1
                                           THEN nb.val END), 0) + 1
                    ELSE coalesce(max(CASE WHEN (nb.i = a.i - 1
                                                 AND nb.j = b.j)
                                             OR (nb.i = a.i
                                                 AND nb.j = b.j - 1)
                                           THEN nb.val END), 0)
               END AS val
        FROM (SELECT max(d) AS d FROM dp) cur, maxd, ta a
        JOIN tb b ON b.source = a.source
        JOIN dp nb ON nb.source = a.source
        WHERE a.i + b.j = cur.d + 1 AND cur.d < maxd.dmax
          AND nb.i BETWEEN a.i - 1 AND a.i
          AND nb.j BETWEEN b.j - 1 AND b.j
          AND NOT (nb.i = a.i AND nb.j = b.j)
        GROUP BY a.source, cur.d, a.i, b.j, a.tok, b.tok
        UNION ALL
        SELECT p.source AS source, p.d AS d, p.i AS i, p.j AS j,
               p.val AS val
        FROM dp p, (SELECT max(d) AS d FROM dp) cur, maxd
        WHERE p.d = cur.d AND cur.d < maxd.dmax))
    SELECT pr.source AS source,
           CAST(pr.n AS BIGINT) AS la,
           CAST(pr.m AS BIGINT) AS lb,
           CAST(max(dp.val) AS BIGINT) AS lcs_len,
           round(CAST(2 * max(dp.val) AS DOUBLE) / (pr.n + pr.m), 6)
             AS rouge_l_f
    FROM pairs pr JOIN dp ON dp.source = pr.source
      AND dp.i = pr.n AND dp.j = pr.m
    GROUP BY pr.source, pr.n, pr.m
    """,
    description=(
        "exact ROUGE-L between each source's two earliest documents: "
        "LCS length over the first 24 tokens via an Arrow-batched "
        "pandas DP (one bounded row per source; the same operator "
        "verifies LSH candidate pairs at scale), F = 2*LCS/(la+lb). "
        "The oracle replays the identical DP as a recursive CTE over "
        "anti-diagonals (evt_dtw_check discipline) — a dynamic "
        "program hash-checked across two engines"
    ),
    tags=("documents", "text", "similarity", "pandas-udf"),
)
def doc_lcs_rouge(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    tk = docs.select(
        "source",
        "doc_id",
        F.slice(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col("text"))), r"\s+", " "
                    ),
                    " ",
                ),
                lambda w: w != "",
            ),
            1,
            _LCS_CAP,
        ).alias("tk"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    )
    a = tk.filter(F.col("rn") == 1).select(
        "source", F.col("tk").alias("tka")
    )
    b = tk.filter(F.col("rn") == 2).select(
        "source", F.col("tk").alias("tkb")
    )
    pairs = (
        a.join(b, "source")
        .filter((F.size("tka") >= 1) & (F.size("tkb") >= 1))
        .select(
            "source",
            "tka",
            "tkb",
            F.size("tka").cast("bigint").alias("la"),
            F.size("tkb").cast("bigint").alias("lb"),
        )
    )

    def _lcs_batches(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x, y = list(r.tka), list(r.tkb)
                n, m = len(x), len(y)
                prev = [0] * (m + 1)
                for i in range(1, n + 1):
                    cur = [0] * (m + 1)
                    xi = x[i - 1]
                    for j in range(1, m + 1):
                        if xi == y[j - 1]:
                            cur[j] = prev[j - 1] + 1
                        else:
                            cur[j] = max(prev[j], cur[j - 1])
                    prev = cur
                out.append((r.source, r.la, r.lb, prev[m]))
            yield pd.DataFrame(
                out, columns=["source", "la", "lb", "lcs_len"]
            )

    lcs = pairs.mapInPandas(
        _lcs_batches,
        "source string, la long, lb long, lcs_len long",
    )
    # the F measure divides in ENGINE expressions (identical rounding
    # convention both sides), never in Python
    return lcs.select(
        "source",
        "la",
        "lb",
        F.col("lcs_len").cast("bigint").alias("lcs_len"),
        F.round(
            (2 * F.col("lcs_len")).cast("double")
            / (F.col("la") + F.col("lb")),
            6,
        ).alias("rouge_l_f"),
    )


@register(
    "emb_hopkins_statistic",
    oracle=f"""
    WITH ref AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM embeddings),
    r AS (SELECT vec_id, embedding FROM ref WHERE rk <= {_N_REF}),
    rd AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS d,
             CAST(round(1000 * CAST(unnest(embedding) AS DOUBLE))
                  AS BIGINT) AS xm
      FROM r),
    bounds AS (
      SELECT d, min(xm) AS lo, max(xm) AS hi FROM rd GROUP BY d),
    probes AS (
      SELECT p.p, b.d,
             b.lo + ((b.hi - b.lo)
                     * (('0x' || substr(md5('hop' || CAST(p.p AS VARCHAR)
                                        || ':' || CAST(b.d AS VARCHAR)),
                                        1, 8))::BIGINT % 1001)) // 1000
               AS um
      FROM (SELECT unnest(range(1, {_N_PROBE} + 1)) AS p) p
      CROSS JOIN bounds b),
    u AS (
      SELECT s.p, min(s.d2) AS d2
      FROM (SELECT pr.p AS p, rd.vec_id,
                   sum((pr.um - rd.xm) * (pr.um - rd.xm)) AS d2
            FROM probes pr JOIN rd ON rd.d = pr.d
            GROUP BY pr.p, rd.vec_id) s
      GROUP BY s.p),
    xsel AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY md5('hop:' || CAST(vec_id AS VARCHAR)), vec_id)
               AS rk
      FROM r),
    x AS (SELECT vec_id FROM xsel WHERE rk <= {_N_PROBE}),
    w AS (
      SELECT s.qid, min(s.d2) AS d2
      FROM (SELECT q.vec_id AS qid,
                   sum((qd.xm - rd.xm) * (qd.xm - rd.xm)) AS d2
            FROM x q
            JOIN rd qd ON qd.vec_id = q.vec_id
            JOIN rd ON rd.d = qd.d AND rd.vec_id <> q.vec_id
            GROUP BY q.vec_id, rd.vec_id) s
      GROUP BY s.qid),
    agg AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_ref,
             (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_probe,
             (SELECT CAST(sum(d2) AS BIGINT) FROM u) AS sum_u,
             (SELECT CAST(sum(d2) AS BIGINT) FROM w) AS sum_w)
    SELECT n_ref, n_probe, sum_u, sum_w,
           round(CAST(sum_u AS DOUBLE) / (sum_u + sum_w), 6)
             AS hopkins
    FROM agg
    """,
    description=(
        "Hopkins clustering-tendency statistic over the embedding "
        "corpus: H = sum(u)/(sum(u)+sum(w)) of squared NN distances "
        "for 32 md5-derived synthetic probes inside the per-dimension "
        "bounding box vs 32 md5-chosen real points (self excluded), "
        "against a 256-point md5-sampled reference set. H~0.5 = "
        "uniform, H->1 = clustered (worth an IVF/k-means index). "
        "Milli-int coordinates, exact BIGINT distances; every frame "
        "cap-bounded (256*64 cells) regardless of corpus size"
    ),
    tags=("embeddings", "statistics", "ann"),
)
def emb_hopkins_statistic(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    r = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_N_REF)
        .select("vec_id", "embedding")
    )
    rd = (
        r.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "d0", "xv"
            ),
        )
        .select(
            "vec_id",
            (F.col("d0") + 1).alias("d"),
            F.round(F.lit(1000) * F.col("xv")).cast("bigint").alias("xm"),
        )
        .localCheckpoint(eager=False)  # feeds bounds, u-join and w-join
    )
    bounds = rd.groupBy("d").agg(
        F.min("xm").alias("lo"), F.max("xm").alias("hi")
    )
    probes = (
        spark.range(1, _N_PROBE + 1)
        .select(F.col("id").alias("p"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "p",
            "d",
            (
                F.col("lo")
                + F.expr(
                    "((hi - lo) * (CAST(conv(substring(md5(concat('hop',"
                    " CAST(p AS STRING), ':', CAST(d AS STRING))), 1, 8),"
                    " 16, 10) AS BIGINT) % 1001)) div 1000"
                )
            ).alias("um"),
        )
    )
    u = (
        probes.join(F.broadcast(rd), "d")
        .groupBy("p", "vec_id")
        .agg(
            F.sum((F.col("um") - F.col("xm")) * (F.col("um") - F.col("xm")))
            .alias("d2")
        )
        .groupBy("p")
        .agg(F.min("d2").alias("d2"))
    )
    x = (
        r.orderBy(
            F.md5(F.concat(F.lit("hop:"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(_N_PROBE)
        .select(F.col("vec_id").alias("qid"))
    )
    qd = (
        rd.join(F.broadcast(x), rd.vec_id == F.col("qid"))
        .select("qid", "d", F.col("xm").alias("qm"))
        .alias("q")
    )
    # qd derives from rd: explicit aliases keep the self-lineage
    # equi-join unambiguous (the doc_dedup_spans_removal discipline)
    rr = rd.select("vec_id", "d", "xm").alias("rr")
    w = (
        qd.join(F.broadcast(rr), F.col("q.d") == F.col("rr.d"))
        .filter(F.col("rr.vec_id") != F.col("q.qid"))
        .groupBy(F.col("q.qid").alias("qid"), F.col("rr.vec_id"))
        .agg(
            F.sum(
                (F.col("q.qm") - F.col("rr.xm"))
                * (F.col("q.qm") - F.col("rr.xm"))
            ).alias("d2")
        )
        .groupBy("qid")
        .agg(F.min("d2").alias("d2"))
    )
    agg = (
        r.agg(F.count(F.lit(1)).cast("bigint").alias("n_ref"))
        .crossJoin(
            u.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_probe"),
                F.sum("d2").cast("bigint").alias("sum_u"),
            )
        )
        .crossJoin(w.agg(F.sum("d2").cast("bigint").alias("sum_w")))
    )
    return agg.select(
        "n_ref",
        "n_probe",
        "sum_u",
        "sum_w",
        F.round(
            F.col("sum_u").cast("double") / (F.col("sum_u") + F.col("sum_w")),
            6,
        ).alias("hopkins"),
    )
