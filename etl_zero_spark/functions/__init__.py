"""Reusable Column-expression builders (dates, fuzzy matching, vectors).

Everything here returns/uses native ``pyspark.sql.Column`` expressions
so the hot path stays inside whole-stage codegen; Python-side helpers
operate only on metadata (column names)."""
