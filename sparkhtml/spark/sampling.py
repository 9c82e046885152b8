"""Deterministic corpus splitting & stratified sampling.

Training-data-pipeline layer: the split/sample decisions are
content-addressed — ``md5(seed:id)`` hash buckets, no RNG state — so they
are reproducible across runs, executors, and engines (the DuckDB oracle
recomputes the identical buckets with ``('0x' || substr(md5(..),1,6))``).
At 10^12 rows this matters twice over: a resumed or re-run job must not
re-deal the split, and a held-out set must stay held out when the corpus
is re-partitioned. Everything here is a per-row JVM expression — zero
shuffle, zero Python, scan-local at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: str, seed: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 24 bits of
    ``md5(seed:id)``, mod buckets. 24 bits ≫ bucket counts in use, so
    bucket occupancy is uniform to ~1e-5."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
                1, 6,
            ),
            16, 10,
        ).cast("bigint")
        % buckets
    )


def train_split(
    df: DataFrame, id_col: str = "doc_id", val_pct: int = 5,
    test_pct: int = 5, seed: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column: 'test' / 'val' / 'train' by hash bucket.

    Seed-versioned: bumping ``seed`` re-deals the whole split; keeping it
    pins every document's assignment forever (the property eval-set
    hygiene needs — a document can never migrate from test into train
    between pipeline runs).
    """
    h = hash_bucket(id_col, seed)
    split = (
        F.when(h < test_pct, "test")
        .when(h < test_pct + val_pct, "val")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame, strata_col: str = "lang",
    fractions: dict[str, float] | None = None, default: float = 1.0,
    id_col: str = "doc_id", seed: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic downsample (e.g. rebalance languages):
    keep a row iff its hash bucket (of 10,000) falls under the stratum's
    fraction. Unlike ``DataFrame.sampleBy`` this is exact-reproducible —
    membership depends only on (seed, id), not on partitioning or
    Bernoulli draws — so reruns and engines agree row-for-row.
    """
    denom = 10_000
    h = hash_bucket(id_col, seed, denom)
    frac = F.lit(float(default))
    for k, v in (fractions or {}).items():
        frac = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(frac)
    return df.filter(h < (frac * denom).cast("bigint"))
