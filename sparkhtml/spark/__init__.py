"""Spark layer: batching, schemas, partitioning, planning.

All per-document HTML work happens in Arrow-batched pandas UDFs from
:mod:`sparkhtml.spark.pipeline`; everything cross-document is plain
DataFrame API so Catalyst owns pushdown/pruning/AQE (SURVEY.md §4.2).
"""
