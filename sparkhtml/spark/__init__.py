"""Spark layer: batching, schemas, partitioning, planning.

All per-document HTML work happens in Arrow-batched pandas UDFs from
:mod:`sparkhtml.spark.pipeline`; everything cross-document is plain
DataFrame API so Catalyst owns pushdown/pruning/AQE (SURVEY.md §4.2).
"""

from pyspark.sql import DataFrame

_CACHED_ATTR = "_sparkhtml_cached_deps"


def _register_cached(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record cached intermediates on a result DataFrame so long-lived
    sessions can release them once the result is consumed."""
    setattr(out, _CACHED_ATTR, list(deps))
    return out


def release_cached(df: DataFrame) -> int:
    """Unpersist the cached intermediates a dedup/similarity operator
    registered on ``df`` (no-op for other DataFrames). Returns the number
    of entries released. Per-job pipelines can ignore this — the cache
    dies with the session — but long-lived sessions should call it after
    consuming the result."""
    deps = getattr(df, _CACHED_ATTR, None) or []
    for d in deps:
        d.unpersist()
    setattr(df, _CACHED_ATTR, [])
    return len(deps)
