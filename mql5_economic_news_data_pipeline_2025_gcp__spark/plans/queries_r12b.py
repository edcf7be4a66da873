"""Round-12b batch: Goodman–Kruskal lambda and Burrows' Delta.

``evt_gk_lambda`` — Goodman–Kruskal λ for NOMINAL association on the
hour-bucket × event-type contingency table: the proportional-reduction-
in-error measure (how much better the modal prediction of a column gets
once the row is known), in both directions plus the symmetric form.
Completes the association family: γ (``rel_goodman_kruskal_gamma``) is
the ordinal member, χ² (``evt_chisq_independence``) the omnibus test —
λ is the nominal effect size, and every numerator/denominator here is
an exact integer (sums of cell maxima), with only the final display
ratio divided.

``doc_burrows_delta`` — Burrows' Delta stylometry between document
sources: z-scores of the top-K most-frequent words' per-million rates
across sources, Delta(a,b) = mean |z_a − z_b|. The classic authorship-
attribution / style-drift measure a corpus curator runs to find sources
whose register diverges (boilerplate mills vs prose). Determinism: the
per-million rates are integer (floor) divisions, z = (n·f − S) /
sqrt(n·Q − S²) divides an integer by the sqrt of an integer — sqrt is
IEEE-754 correctly rounded, so both engines produce the identical
double — and z is rounded to micro-units BEFORE the |·| sums, so the
pair aggregation is integer-exact. Zero-variance words (same rate in
every source) are excluded identically on both sides.

Scale: λ folds the fact table to a |buckets|·|types| grid in one pass.
Delta folds tokens to (source, word) counts for a BROADCAST top-K word
set; the z frame is K·|sources| rows and the pair frame |sources|²
rows — both bounded by catalog dimensions, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register

_TOPK = 20


@register(
    "evt_gk_lambda",
    oracle="""
    WITH c AS (
      SELECT CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS hb,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    rowmax AS (SELECT hb, max(n) AS mx FROM c GROUP BY hb),
    colmax AS (SELECT event_type, max(n) AS mx FROM c GROUP BY event_type),
    rowtot AS (SELECT hb, sum(n) AS tot FROM c GROUP BY hb),
    coltot AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY event_type),
    sc AS (
      SELECT (SELECT sum(mx) FROM rowmax) AS sum_rowmax,
             (SELECT sum(mx) FROM colmax) AS sum_colmax,
             (SELECT max(tot) FROM coltot) AS max_coltot,
             (SELECT max(tot) FROM rowtot) AS max_rowtot,
             (SELECT sum(n) FROM c) AS n)
    SELECT CAST(sum_rowmax - max_coltot AS BIGINT) AS num_col_given_row,
           CAST(n - max_coltot AS BIGINT) AS den_col_given_row,
           round(CAST(sum_rowmax - max_coltot AS DOUBLE)
                 / (n - max_coltot), 6) AS lambda_col_given_row,
           CAST(sum_colmax - max_rowtot AS BIGINT) AS num_row_given_col,
           CAST(n - max_rowtot AS BIGINT) AS den_row_given_col,
           round(CAST(sum_colmax - max_rowtot AS DOUBLE)
                 / (n - max_rowtot), 6) AS lambda_row_given_col,
           CAST(sum_rowmax + sum_colmax - max_coltot - max_rowtot
                AS BIGINT) AS num_sym,
           CAST(2 * n - max_coltot - max_rowtot AS BIGINT) AS den_sym,
           round(CAST(sum_rowmax + sum_colmax - max_coltot - max_rowtot
                      AS DOUBLE)
                 / (2 * n - max_coltot - max_rowtot), 6) AS lambda_sym
    FROM sc
    """,
    description=(
        "Goodman-Kruskal lambda (nominal PRE association) on the "
        "hour-bucket x event-type contingency grid: modal-prediction "
        "error reduction in both directions plus the symmetric form, "
        "every numerator/denominator an exact integer sum of cell "
        "maxima; one fact fold to a |buckets|*|types| grid. The "
        "nominal effect size next to ordinal gamma and omnibus chi^2"
    ),
    tags=("events", "statistics", "association"),
)
def evt_gk_lambda(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    # one fact pass -> 4 x |types| grid; checkpoint: five scalar
    # aggregates below re-reference it
    c = (
        ev.groupBy(
            (F.hour("ts") / 6).cast("bigint").alias("hb"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    sc = (
        c.groupBy("hb")
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .agg(
            F.sum("mx").alias("sum_rowmax"),
            F.max("tot").alias("max_rowtot"),
        )
        .crossJoin(
            c.groupBy("event_type")
            .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
            .agg(
                F.sum("mx").alias("sum_colmax"),
                F.max("tot").alias("max_coltot"),
            )
        )
        .crossJoin(c.agg(F.sum("n").alias("n")))
    )
    num_cr = F.col("sum_rowmax") - F.col("max_coltot")
    den_cr = F.col("n") - F.col("max_coltot")
    num_rc = F.col("sum_colmax") - F.col("max_rowtot")
    den_rc = F.col("n") - F.col("max_rowtot")
    num_s = (
        F.col("sum_rowmax")
        + F.col("sum_colmax")
        - F.col("max_coltot")
        - F.col("max_rowtot")
    )
    den_s = 2 * F.col("n") - F.col("max_coltot") - F.col("max_rowtot")
    return sc.select(
        num_cr.cast("bigint").alias("num_col_given_row"),
        den_cr.cast("bigint").alias("den_col_given_row"),
        F.round(num_cr.cast("double") / den_cr, 6).alias(
            "lambda_col_given_row"
        ),
        num_rc.cast("bigint").alias("num_row_given_col"),
        den_rc.cast("bigint").alias("den_row_given_col"),
        F.round(num_rc.cast("double") / den_rc, 6).alias(
            "lambda_row_given_col"
        ),
        num_s.cast("bigint").alias("num_sym"),
        den_s.cast("bigint").alias("den_sym"),
        F.round(num_s.cast("double") / den_s, 6).alias("lambda_sym"),
    )


@register(
    "doc_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS w
      FROM documents),
    tk AS (SELECT source, w FROM toks WHERE w <> ''),
    topw AS (
      SELECT w FROM tk GROUP BY w
      ORDER BY count(*) DESC, w ASC LIMIT {_TOPK}),
    srctot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tok
      FROM tk GROUP BY source),
    cell AS (
      SELECT s.source, tw.w,
             coalesce(c.n, 0) * 1000000 // s.n_tok AS f
      FROM srctot s
      CROSS JOIN topw tw
      LEFT JOIN (
        SELECT source, w, CAST(count(*) AS BIGINT) AS n
        FROM tk WHERE w IN (SELECT w FROM topw)
        GROUP BY source, w) c
        ON c.source = s.source AND c.w = tw.w),
    st AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(f) AS BIGINT) AS s,
             CAST(sum(f * f) AS BIGINT) AS q
      FROM cell GROUP BY w),
    z AS (
      SELECT c.source, c.w,
             CAST(round(1000000 * (st.ns * c.f - st.s)
                        / sqrt(CAST(st.ns * st.q - st.s * st.s
                                    AS DOUBLE))) AS BIGINT) AS z_micro
      FROM cell c JOIN st ON st.w = c.w
      WHERE st.ns * st.q - st.s * st.s > 0)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(abs(a.z_micro - b.z_micro)) AS BIGINT)
             AS delta_sum_micro,
           round(CAST(sum(abs(a.z_micro - b.z_micro)) AS DOUBLE)
                 / (count(*) * 1000000), 6) AS burrows_delta
    FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    description=(
        "Burrows' Delta stylometry between document sources: top-"
        f"{_TOPK} word per-million rates (integer floor divisions), "
        "cross-source z-scores as integer/sqrt(integer) doubles "
        "rounded to micro-units, Delta(a,b) = mean |z_a - z_b| as an "
        "exact integer sum per source pair. Zero-variance words "
        "excluded identically on both engines. The corpus-curation "
        "lens for register drift between sources; token fold -> "
        "broadcast K-word grid (K*|sources| rows) -> |sources|^2 "
        "pair frame, all catalog-bounded"
    ),
    tags=("documents", "text", "stylometry"),
)
def doc_burrows_delta(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    tk = (
        docs.select(
            "source",
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col("text"))), r"\s+", " "
                    ),
                    " ",
                )
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    # token fold feeds top-K, source totals AND the cell counts —
    # materialize the (source, w) counts once; |vocab|-bounded
    sw = (
        tk.groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    topw = (
        sw.groupBy("w")
        .agg(F.sum("n").alias("n_tot"))
        .orderBy(F.desc("n_tot"), F.asc("w"))
        .limit(_TOPK)
        .select("w")
    )
    srctot = sw.groupBy("source").agg(F.sum("n").alias("n_tok"))
    cell = (
        srctot.crossJoin(F.broadcast(topw))
        .join(F.broadcast(sw.join(F.broadcast(topw), "w")), ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr("coalesce(n, 0) * 1000000 div n_tok").alias("f"),
        )
        .localCheckpoint(eager=False)
    )
    st = cell.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.sum("f").cast("bigint").alias("s"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("q"),
    )
    z = (
        cell.join(F.broadcast(st), "w")
        .filter(F.col("ns") * F.col("q") - F.col("s") * F.col("s") > 0)
        .select(
            "source",
            "w",
            F.round(
                F.lit(1000000)
                * (F.col("ns") * F.col("f") - F.col("s"))
                / F.sqrt(
                    (F.col("ns") * F.col("q") - F.col("s") * F.col("s"))
                    .cast("double")
                ),
            )
            .cast("bigint")
            .alias("z_micro"),
        )
    )
    a, b = z.alias("a"), z.alias("b")
    pair = a.join(
        b,
        (F.col("b.w") == F.col("a.w"))
        & (F.col("a.source") < F.col("b.source")),
    )
    return pair.groupBy(
        F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.abs(F.col("a.z_micro") - F.col("b.z_micro")))
        .cast("bigint")
        .alias("delta_sum_micro"),
        F.round(
            F.sum(F.abs(F.col("a.z_micro") - F.col("b.z_micro")))
            .cast("double")
            / (F.count(F.lit(1)) * 1000000),
            6,
        ).alias("burrows_delta"),
    )
