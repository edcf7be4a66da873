"""Round-10i batch: graded retrieval evaluation (NDCG) and the Hoover
inequality index.

``doc_ndcg_at_k`` — NDCG@10 sufficient statistics for a literal
3-query panel over the corpus: documents are scored by summed term
frequency (ties → doc_id), graded relevance = number of DISTINCT
query terms present (gain 2^rel − 1), and the position discounts
1/log₂(i+1) are a 10-entry LITERAL micro-unit table so no log
executes in either engine (the r9aa lattice discipline). Emits DCG
and ideal-DCG micro-totals per query; the gate assembles NDCG and
pins 0 < NDCG ≤ 1 plus the ideal-ranking dominance. This opens the
graded-IR-evaluation family the registry lacked: `doc_bm25_search`
RANKS, `evt_rank_auc` scores binary classification, `doc_rbo_term_ranks`
compares rankings — none measures graded retrieval QUALITY.

``evt_hoover_index`` — the Hoover (Robin Hood) index of per-user value
concentration within each event type: H = Σ|x_u − X/n| / (2X), the
fraction of total value that would have to move to equalize users —
the fourth member of the inequality family
(`evt_gini_value`, `evt_theil_inequality`, `evt_atkinson_stats`) and
the only one with a direct operational reading. Emitted as the exact
integer numerator Σ|n·x_u − X| (the gate divides by 2·n·X).

Determinism: tf and relevance are integer token-array folds over the
literal term table; ranks break ties on doc_id; discounts are literal
integers; Hoover's absolute deviations are integer cross-products.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register

#: literal query panel (terms exist across the fixture vocabulary)
_QUERIES = (
    ("q_exec", ("scan", "join", "shuffle")),
    ("q_stream", ("stream", "window", "state")),
    ("q_sortmerge", ("hash", "sort", "merge")),
)
_K = 10
#: 1/log2(i+1) position discounts in micro-units — LITERAL in both
#: engines (i = 1..10)
_DISC = {i: round(1_000_000 / math.log2(i + 1)) for i in range(1, _K + 1)}


def _sql_query_table() -> str:
    rows = ", ".join(
        f"('{name}', ['{t1}', '{t2}', '{t3}'])"
        for name, (t1, t2, t3) in _QUERIES
    )
    return f"(VALUES {rows}) AS q(qname, terms)"


def _sql_disc_table() -> str:
    rows = ", ".join(f"({i}, {d})" for i, d in _DISC.items())
    return f"(VALUES {rows}) AS d(pos, d_u)"


@register(
    "doc_ndcg_at_k",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         w -> w <> '') AS toks
      FROM documents),
    scored AS (
      SELECT q.qname, w.doc_id,
             len(list_filter(w.toks,
                             x -> list_contains(q.terms, x))) AS score,
             len(list_filter(q.terms,
                             t -> list_contains(w.toks, t))) AS rel
      FROM ws w CROSS JOIN {_sql_query_table()}),
    nz AS (SELECT * FROM scored WHERE score > 0 OR rel > 0),
    ranked AS (
      SELECT qname, doc_id, rel,
             row_number() OVER (PARTITION BY qname
                                ORDER BY score DESC, doc_id) AS pos,
             row_number() OVER (PARTITION BY qname
                                ORDER BY rel DESC, doc_id) AS ipos
      FROM nz),
    dcg AS (
      SELECT r.qname,
             sum(CASE WHEN r.pos = d.pos
                      THEN ((1 << r.rel) - 1) * d.d_u ELSE 0 END)
               AS dcg_u,
             sum(CASE WHEN r.ipos = d.pos
                      THEN ((1 << r.rel) - 1) * d.d_u ELSE 0 END)
               AS idcg_u
      FROM ranked r CROSS JOIN {_sql_disc_table()}
      GROUP BY r.qname),
    rc AS (
      SELECT qname, CAST(count(*) FILTER (rel > 0) AS BIGINT) AS n_rel
      FROM nz GROUP BY qname)
    SELECT dcg.qname,
           CAST(dcg.dcg_u AS BIGINT) AS dcg_u,
           CAST(dcg.idcg_u AS BIGINT) AS idcg_u,
           rc.n_rel
    FROM dcg JOIN rc ON rc.qname = dcg.qname
    """,
    description=(
        "NDCG@10 sufficient statistics for a 3-query literal panel: "
        "tf-scored ranking (ties → doc_id), graded relevance = "
        "distinct query terms present (gain 2^rel − 1), position "
        "discounts a LITERAL 1/log₂(i+1) micro-unit table — DCG and "
        "ideal-DCG totals are exact integers in both engines; the "
        "gate assembles NDCG ∈ (0, 1] and checks ideal dominance. "
        "Shape: one token-array pass against a 3-row broadcast query "
        "table, two rank windows per query partition, one fold"
    ),
    tags=("documents", "search", "metrics"),
)
def doc_ndcg_at_k(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    qrows = [(name, list(terms)) for name, terms in _QUERIES]
    queries = docs.sparkSession.createDataFrame(
        qrows, "qname string, terms array<string>"
    )
    ws = docs.select("doc_id", tokens("text").alias("toks"))
    scored = ws.crossJoin(F.broadcast(queries)).select(
        "qname",
        "doc_id",
        F.size(
            F.expr("filter(toks, x -> array_contains(terms, x))")
        ).alias("score"),
        F.size(
            F.expr("filter(terms, t -> array_contains(toks, t))")
        ).alias("rel"),
    )
    nz = scored.filter((F.col("score") > 0) | (F.col("rel") > 0))
    wq = Window.partitionBy("qname")
    ranked = nz.select(
        "qname",
        "rel",
        F.row_number()
        .over(wq.orderBy(F.desc("score"), "doc_id"))
        .alias("pos"),
        F.row_number()
        .over(wq.orderBy(F.desc("rel"), "doc_id"))
        .alias("ipos"),
    )
    disc = nz.sparkSession.createDataFrame(
        list(_DISC.items()), "pos int, d_u bigint"
    )
    gain = F.expr("shiftleft(1, rel) - 1")
    joined = ranked.crossJoin(F.broadcast(disc.withColumnRenamed("pos", "dpos")))
    dcg = joined.groupBy("qname").agg(
        F.sum(
            F.when(F.col("pos") == F.col("dpos"), gain * F.col("d_u"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("dcg_u"),
        F.sum(
            F.when(F.col("ipos") == F.col("dpos"), gain * F.col("d_u"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("idcg_u"),
    )
    rc = nz.groupBy("qname").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel")
    )
    return dcg.join(F.broadcast(rc), "qname").select(
        "qname", "dcg_u", "idcg_u", "n_rel"
    )


@register(
    "evt_hoover_index",
    oracle="""
    WITH u AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, user_id),
    tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS total_c
      FROM u GROUP BY event_type)
    SELECT u.event_type, tot.n AS n_users, tot.total_c,
           CAST(sum(abs(tot.n * u.x - tot.total_c)) AS BIGINT)
             AS hoover_num
    FROM u JOIN tot ON tot.event_type = u.event_type
    GROUP BY u.event_type, tot.n, tot.total_c
    """,
    description=(
        "Hoover (Robin Hood) index numerator per event type: "
        "Σ|n·x_u − X| over per-user cent totals — the gate divides by "
        "2·n·X to get the share of total value that would have to "
        "move to equalize users, the operational member of the "
        "inequality family next to Gini/Theil/Atkinson. Shape: one "
        "(type, user) fold, a |types|-row totals window-lift join, "
        "one fold"
    ),
    tags=("events", "statistics", "inequality"),
)
def evt_hoover_index(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type")
    ut = u.select(
        "event_type",
        "x",
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("x").over(wt).alias("total_c"),
    )
    return ut.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.max("total_c").cast("bigint").alias("total_c"),
        F.sum(F.abs(F.col("n") * F.col("x") - F.col("total_c")))
        .cast("bigint")
        .alias("hoover_num"),
    )
