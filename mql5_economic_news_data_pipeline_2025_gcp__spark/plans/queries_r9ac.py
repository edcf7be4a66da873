"""Round-9 batch ac: integer Walsh–Hadamard sequency analysis.

``evt_walsh_hadamard_energy`` — the order-8 Walsh–Hadamard transform of
each type's daily series, taken over non-overlapping 8-day blocks, with
per-sequency energy totals.  The WHT is the INTEGER-EXACT spectral
transform (coefficients are ±1 sums — no sines, no floats), so it
gives a frequency-like decomposition that two engines can agree on
bit-for-bit: sequency 0 is the block mean (trend energy), low
sequencies are slow drift, high sequencies are day-to-day chop.  The
square-wave complement to `evt_haar_energy` (Haar localizes in time;
Walsh functions span the whole block) — together they cover the
integer-transform family a float FFT can't join under the
cross-engine determinism contract.

Determinism: block/position indexes are flooring division/modulo on
the 1-based rank (always positive); coefficients are literal ±1 sums;
energies ship as 2²⁰-split component sums of |c| (the sign folds away
in c², and |c| keeps the split on non-negative operands).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_S20 = 1048576


def _hadamard8() -> list[list[int]]:
    h = [[1]]
    while len(h) < 8:
        h = [r + r for r in h] + [r + [-v for v in r] for r in h]
    return h


#: rows ordered by SEQUENCY (number of sign changes), the Walsh order
_H8 = sorted(
    _hadamard8(),
    key=lambda r: sum(1 for a, b in zip(r, r[1:]) if a != b),
)


@register(
    "evt_walsh_hadamard_energy",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, x,
             (row_number() OVER (PARTITION BY event_type ORDER BY day)
              - 1) // 8 AS blk,
             (row_number() OVER (PARTITION BY event_type ORDER BY day)
              - 1) % 8 AS pos
      FROM d),
    b AS (
      SELECT event_type, blk,
             {", ".join(
                 "CAST(sum(CASE WHEN pos = " + str(j) + " THEN x ELSE 0 "
                 "END) AS BIGINT) AS x" + str(j) for j in range(8))},
             CAST(count(*) AS BIGINT) AS m
      FROM r GROUP BY event_type, blk HAVING count(*) = 8),
    coef AS (
      SELECT event_type, blk, seq, abs(c) AS a FROM b,
      LATERAL (VALUES {", ".join(
          "(" + str(k) + ", " + " + ".join(
              ("" if _H8[k][j] > 0 else "-") + "x" + str(j)
              for j in range(8)) + ")" for k in range(8))})
        AS v(seq, c)),
    sp AS (
      SELECT event_type, seq, a,
             a // {_S20} AS ah, a % {_S20} AS al
      FROM coef)
    SELECT event_type, CAST(seq AS BIGINT) AS seq,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(a) AS BIGINT) AS sum_abs_c,
           CAST(sum(ah * ah) AS BIGINT) AS e2,
           CAST(sum(2 * ah * al) AS BIGINT) AS e1,
           CAST(sum(al * al) AS BIGINT) AS e0
    FROM sp GROUP BY event_type, seq
    """,
    description=(
        "order-8 Walsh–Hadamard sequency energies per event_type: "
        "non-overlapping 8-day blocks (flooring rank division, always "
        "positive; partial tail blocks dropped by the count = 8 "
        "gate), coefficients as LITERAL ±1 sums in sequency order — "
        "the integer-exact spectral transform no float FFT can "
        "replace under the cross-engine contract. Per-sequency "
        "energy Σc² ships as 2²⁰-split components of |c| (sign folds "
        "away in the square, |c| keeps the split non-negative); the "
        "gate reassembles energies in Python bigints and pins the "
        "Parseval identity Σ_seq Σc² = 8·Σ_blocks Σx² exactly. "
        "Sequency 0 = trend energy, 7 = day-to-day chop — the "
        "square-wave complement of evt_haar_energy. Shape: one "
        "(type, day) rollup, one rank window, one (type, blk) fold, "
        "a literal 8-way expansion, one final fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_walsh_hadamard_energy(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "x",
        F.expr(
            "(row_number() OVER (PARTITION BY event_type ORDER BY day)"
            " - 1) DIV 8"
        ).alias("blk"),
        (
            (F.row_number().over(wt) - 1) % 8
        ).alias("pos"),
    )
    b = (
        r.groupBy("event_type", "blk")
        .agg(
            *[
                F.sum(F.when(F.col("pos") == j, F.col("x")).otherwise(0))
                .cast("bigint")
                .alias(f"x{j}")
                for j in range(8)
            ],
            F.count(F.lit(1)).alias("m"),
        )
        .filter(F.col("m") == 8)
    )
    rows = []
    for k in range(8):
        c = sum(
            (F.col(f"x{j}") if _H8[k][j] > 0 else -F.col(f"x{j}"))
            for j in range(8)
        )
        rows.append(
            F.struct(
                F.lit(k).cast("bigint").alias("seq"),
                F.abs(c).alias("a"),
            )
        )
    coef = b.select(
        "event_type", F.explode(F.array(*rows)).alias("kc")
    ).select("event_type", "kc.seq", "kc.a")
    sp = coef.select(
        "event_type",
        "seq",
        "a",
        F.expr(f"a DIV {_S20}").alias("ah"),
        (F.col("a") % _S20).alias("al"),
    )
    return sp.groupBy("event_type", "seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("a").cast("bigint").alias("sum_abs_c"),
        F.sum(F.col("ah") * F.col("ah")).cast("bigint").alias("e2"),
        F.sum(2 * F.col("ah") * F.col("al")).cast("bigint").alias("e1"),
        F.sum(F.col("al") * F.col("al")).cast("bigint").alias("e0"),
    )
