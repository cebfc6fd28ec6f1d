"""Spark operators: classification exprs, extraction stages, pipeline
assembly, and validation aggregates."""
