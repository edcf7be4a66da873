"""Scalar parsing/cleaning functions (reference F1-F11), as pure Column
expressions so Catalyst can fold, push down, and codegen them.

The reference implements these as row-at-a-time ``df.apply`` Python
functions (`PUSH:126-151`, `TRAIN:37-59`, `TRAIN:333-339`); here each is a
composition of built-in ``pyspark.sql.functions`` — JVM-side, vectorized,
and usable inside any query without breaking whole-stage codegen.

Semantics preserved exactly (SURVEY §2.8):
- F1 date parse tries formats IN ORDER, US ``M/d/yyyy`` before
  ``d/M/yyyy`` — ambiguous "03/04/2025" parses as March 4.
- F4 numeric parse: ``%`` stripped but NOT divided by 100; K/M/B/T
  magnitude suffixes; unparseable → NULL.
- F3 null-ish text ('', 'nan', 'none', 'null', NULL) → literal 'N/A'.
- F5 impact map is exact-lowercase {'low':1,'medium':2,'high':3}, any
  other value (including 'High') → 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — multi-format date parse (reference PUSH:129-130: 9 formats, order
# matters; `%m/%d/%Y` precedes `%d/%m/%Y` so US wins ambiguity).
#: Java SimpleDateTime-style patterns in the reference's trial order.
DATE_FORMATS = [
    "yyyy-MM-dd",
    "d MMMM yyyy",
    "M/d/yyyy",
    "d/M/yyyy",
    "yyyy/M/d",
    "M-d-yyyy",
    "d-M-yyyy",
    "MMM d, yyyy",
    "MMMM d, yyyy",
]


def parse_date_multi(col: Column | str) -> Column:
    """F1: first-success date parse over the reference's 9 formats."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in DATE_FORMATS])


def parse_time_to_seconds(col: Column | str) -> Column:
    """F2: time-of-day parse → seconds since midnight (Spark has no TIME
    scalar; reference formats `%H:%M`, `%I:%M %p`, `%H:%M:%S`, plus the
    pandas timedelta artifact ``"0 days 17:00:00"`` — TRAIN:89-112)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    # the "N days HH:MM:SS" artifact: take the trailing clock part
    clock = F.regexp_extract(c, r"(\d{1,2}):(\d{2})(?::(\d{2}))?\s*$", 0)
    parsed = F.coalesce(
        F.try_to_timestamp(c, F.lit("H:mm")),
        F.try_to_timestamp(c, F.lit("h:mm a")),
        F.try_to_timestamp(c, F.lit("H:mm:ss")),
        F.try_to_timestamp(clock, F.lit("H:mm:ss")),
        F.try_to_timestamp(clock, F.lit("H:mm")),
    )
    secs = (
        F.hour(parsed) * 3600 + F.minute(parsed) * 60 + F.second(parsed)
    ).cast("int")
    # AM/PM forms must go through the 'h:mm a' branch; reject bare parse of
    # e.g. '5:30 PM' by the H:mm branch (try_to_timestamp is strict, so the
    # coalesce order already guarantees that).
    return secs


def clean_text(col: Column | str) -> Column:
    """F3: trim; NULL/''/'nan'/'none'/'null' (case-insensitive) → 'N/A'
    (reference PUSH:148-151)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(
        c.isNull() | F.lower(t).isin("", "nan", "none", "null"), F.lit("N/A")
    ).otherwise(t)


#: F4 magnitude suffix multipliers (reference TRAIN:50-55).
_SUFFIX_RE = r"^([-+]?[0-9]*\.?[0-9]+)\s*([KkMmBbTt])$"


def parse_numeric(col: Column | str) -> Column:
    """F4: stringly-numeric parse (reference TRAIN:37-59).

    - ``'3.4%'``  → 3.4   (percent sign stripped, NOT divided by 100)
    - ``'250K'``  → 250000.0 ; M/B/T → 1e6/1e9/1e12 (case-insensitive)
    - ``'-0.1'``  → -0.1
    - ``'N/A'``, ``'abc'``, NULL → NULL
    """
    c = F.col(col) if isinstance(col, str) else col
    v = F.trim(c)
    num = F.regexp_extract(v, _SUFFIX_RE, 1)
    suf = F.upper(F.regexp_extract(v, _SUFFIX_RE, 2))
    mult = (
        F.when(suf == "K", F.lit(1e3))
        .when(suf == "M", F.lit(1e6))
        .when(suf == "B", F.lit(1e9))
        .when(suf == "T", F.lit(1e12))
    )
    return (
        F.when(v.rlike(r"^[-+]?[0-9]*\.?[0-9]+\s*%$"),
               F.regexp_replace(v, r"\s*%$", "").try_cast("double"))
        .when(v.rlike(_SUFFIX_RE), num.try_cast("double") * mult)
        .otherwise(v.try_cast("double"))
    )


def impact_ordinal(col: Column | str) -> Column:
    """F5: exact-lowercase ordinal encode {'low':1,'medium':2,'high':3},
    anything else → 0 (reference TRAIN:333-334 maps then fillna(0))."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "low", F.lit(1))
        .when(c == "medium", F.lit(2))
        .when(c == "high", F.lit(3))
        .otherwise(F.lit(0))
        .cast("int")
    )


def combine_date_time(date_col: Column | str, time_col: Column | str) -> Column:
    """F6: 'Date' + ' ' + 'Time' → timestamp (reference PUSH:156)."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    return F.to_timestamp(F.concat_ws(" ", d.cast("string"), t))


def format_event_date(col: Column | str) -> Column:
    """F7: MySQL ``DATE_FORMAT(Date,'%e %M %Y')`` → 'd MMMM yyyy'
    (reference SQL:27, the `events_formatted` view)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "d MMMM yyyy")


def month_bucket(col: Column | str) -> Column:
    """F8: pandas ``dt.to_period('M')`` → month-truncated date
    (reference TRAIN:417)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c).cast("date")


def trim_fill_dim(col: Column | str, default: str = "Unknown") -> Column:
    """F9: dimension hygiene — fillna(default) then strip
    (reference TRAIN:335-336)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.coalesce(c.cast("string"), F.lit(default)))
