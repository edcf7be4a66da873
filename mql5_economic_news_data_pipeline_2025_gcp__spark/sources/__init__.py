"""Batch sources: fixed-schema CSV ingest + synthetic parquet test tables."""

from .csv_source import read_raw_events_csv
from .tables import load_table, register_views

__all__ = ["read_raw_events_csv", "load_table", "register_views"]
