"""Randomized batch property tests for the scalar parser library:
a seeded generator produces hundreds of inputs per run, a Python model
of the REFERENCE semantics (TRAIN:37-59 parse_numeric_val,
PUSH:126-146 date/time parsers) computes expectations, and one Spark
collect compares the expression library against the model.
"""

from __future__ import annotations

import datetime
import random
import re

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.functions.parsers import (
    parse_date_multi,
    parse_numeric,
)

_SUFFIX = re.compile(r"^([-+]?[0-9]*\.?[0-9]+)\s*([KkMmBbTt])$")
_PCT = re.compile(r"^[-+]?[0-9]*\.?[0-9]+\s*%$")
_MULT = {"K": 1e3, "M": 1e6, "B": 1e9, "T": 1e12}


def _model_numeric(s):
    """Python mirror of the reference parser (TRAIN:37-59)."""
    if s is None:
        return None
    v = s.strip()
    if _PCT.match(v):
        return float(re.sub(r"\s*%$", "", v))
    m = _SUFFIX.match(v)
    if m:
        return float(m.group(1)) * _MULT[m.group(2).upper()]
    try:
        return float(v)
    except ValueError:
        return None


def test_parse_numeric_randomized(spark):
    rng = random.Random(20250813)
    cases: list[str | None] = []
    for _ in range(300):
        base = round(rng.uniform(-9999, 9999), rng.randint(0, 3))
        shape = rng.randrange(8)
        if shape == 0:
            cases.append(f"{base}")
        elif shape == 1:
            cases.append(f"{base}{rng.choice('KkMmBbTt')}")
        elif shape == 2:
            cases.append(f"{base} {rng.choice('KMBT')}")
        elif shape == 3:
            cases.append(f"{abs(base)}%")
        elif shape == 4:
            cases.append(f"+{abs(base)}")
        elif shape == 5:
            cases.append(rng.choice(["N/A", "", "abc", "1.2.3", "K", "%", None]))
        elif shape == 6:
            cases.append(f"  {base}  ")
        else:
            cases.append(f".{rng.randrange(1, 999)}")
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, s string")
    got = {r["i"]: r["p"] for r in df.select("i", parse_numeric("s").alias("p")).collect()}
    for i, c in enumerate(cases):
        want = _model_numeric(c)
        if want is None:
            assert got[i] is None, (c, got[i])
        else:
            assert got[i] is not None and abs(got[i] - want) < 1e-9 * max(1, abs(want)), (
                c, got[i], want,
            )


def test_parse_date_formats_randomized(spark):
    rng = random.Random(7)
    fmts = [
        ("%Y-%m-%d", None),
        ("%d %B %Y", None),
        ("%m/%d/%Y", "us_first"),   # ambiguous slash forms resolve month-first
        ("%Y/%m/%d", None),
        ("%b %d, %Y", None),
        ("%B %d, %Y", None),
    ]
    cases = []
    for _ in range(200):
        d = datetime.date(2020, 1, 1) + datetime.timedelta(days=rng.randrange(4000))
        fmt, rule = rng.choice(fmts)
        s = d.strftime(fmt)
        want = d
        if rule == "us_first":
            # the reference tries %m/%d/%Y before %d/%m/%Y (PUSH:129-130):
            # strftime always yields month-first here, so parse == d
            want = d
        cases.append((s, want))
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, s string"
    )
    got = {r["i"]: r["d"] for r in df.select("i", parse_date_multi(F.col("s")).alias("d")).collect()}
    for i, (s, want) in enumerate(cases):
        assert got[i] == want, (s, got[i], want)
