"""Partitioning & skew handling (SURVEY.md §4.2 'Partitioning / shuffle').

The document-size distribution of a web corpus is heavy-tailed; hash
partitioning by doc_id alone gives even *counts* but uneven *bytes* —
one straggler task holds the 99.9th-percentile giants. Plan:

- ``size_bucket = floor(log2(n_chars))`` — cheap, data-independent, no
  extra pass over the corpus (vs. exact percentiles, which would need one);
- ``salt = pmod(hash(doc_id), SALT_N)`` spreads each bucket;
- repartition on (size_bucket, salt): giants scatter across SALT_N tasks
  instead of hashing into one; AQE skew-join/coalesce handles the rest.

At 10^12 docs the same columns become the Iceberg table's bucket spec, so
the layout is already balanced at rest and the pipeline's first stage
reads without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_N = 64


def doc_size_col() -> "F.Column":
    """Total character payload of a document's text spans."""
    return F.aggregate(
        "spans",
        F.lit(0),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )


def with_size_salt(documents: DataFrame, salt_n: int = SALT_N) -> DataFrame:
    """Add (size_bucket, salt) columns; JVM-side expressions only."""
    n_chars = doc_size_col()
    return documents.withColumn(
        "size_bucket",
        F.floor(F.log2(F.greatest(n_chars, F.lit(1)) + F.lit(1))).cast("int"),
    ).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_n)).cast("int")
    )


def straggler_split(
    documents: DataFrame, char_threshold: int = 1_000_000
) -> tuple[DataFrame, DataFrame]:
    """Route pathological giants (> threshold chars) to a dedicated set of
    tasks (SURVEY.md §4.3 'straggler partition set'). Returns
    (normal, stragglers)."""
    sized = documents.withColumn("_n_chars", doc_size_col())
    normal = sized.filter(F.col("_n_chars") <= char_threshold).drop("_n_chars")
    stragglers = sized.filter(F.col("_n_chars") > char_threshold).drop("_n_chars")
    return normal, stragglers
