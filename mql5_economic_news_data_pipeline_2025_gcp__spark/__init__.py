"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline (economic-calendar events ETL +
per-(Currency,Event) time-series feature/metric dataflow), rebuilt
Spark-first on DataFrame/SQL/Catalyst/Structured Streaming.

Layout
------
- ``session``    : tuned SparkSession factory
- ``schemas``    : explicit StructTypes (raw CSV, canonical events, metrics)
- ``functions``  : scalar column-expression library (parsers F1-F11) — no
                   Python UDFs in the hot path; everything Catalyst-visible
- ``sources``    : batch readers (CSV fixed-schema, parquet test tables)
- ``operators``  : relational/time-series operators (upsert, features,
                   split, normalize, metrics) + large-scale training-data
                   ops (dedup, similarity, text analysis, multimodal)
- ``plans``      : named query registry (Spark fn + DuckDB oracle SQL)
- ``streaming``  : Structured-Streaming ingest (watermark + dedup merge)
- ``pipeline``   : orchestration API mirroring the reference's endpoints
"""

__version__ = "0.1.0"
