"""Named query registry: each entry pairs a PySpark DataFrame program
with its ANSI-SQL DuckDB oracle (the driver's differential-correctness
contract)."""

from .registry import REGISTRY, QuerySpec, oracle_sql, queries

# importing the query modules populates REGISTRY
from . import queries_core  # noqa: E402,F401
from . import queries_ext  # noqa: E402,F401
from . import queries_r3  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
