"""Relational / time-series / training-data operators."""
