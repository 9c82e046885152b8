"""Similarity search over an embedding column (``array<float>``).

Training-data-pipeline layer: brute-force cosine top-k as the exact
baseline, random-hyperplane LSH bucketing as the scale path, and
embedding-cosine near-duplicate pairs.

Scale posture: the query vector broadcasts as a literal array (tiny);
brute-force is a single scan + JVM `aggregate`/`zip_with` dot products +
one top-k (`ORDER BY ... LIMIT k`, executed as TakeOrderedAndProject —
no full sort). The LSH path buckets vectors by sign-bit signature so the
near-dup self-join is an equi-join on the bucket key; at 10^12 rows the
bucket key doubles as the Iceberg partition column so candidate pairs
co-locate at rest. :class:`IVFIndex` is the k-means variant of the same
shape: assign → filter/join on centroid id.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    cos = dot_col(F.col(vec_col), q) / (
        F.greatest(_norm_col(vec_col), F.lit(1e-12)) * F.lit(qnorm)
    )
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature(
    vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
):
    """Sign-bit LSH signature as a bigint column (JVM expressions only).

    Hyperplanes are seeded driver-side constants — identical on every
    executor, no data pass needed.
    """
    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_col(F.col(vec_col), p) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + (bit.cast("long") * F.lit(1 << b))
    return sig


def lsh_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_planes: int = 12, seed: int = 42, probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only buckets within ``probe_hamming`` bits
    of the query's bucket (multi-probe), exact cosine inside.

    Recall/latency trade: n_planes buckets the corpus 2^n ways; probing
    Hamming≤1 reads (1 + n_planes)/2^n of the data in expectation.
    """
    dim = len(query)
    sig = hyperplane_signature(vec_col, dim, n_planes, seed)
    bucketed = df.withColumn("_bucket", sig)

    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    qsig = 0
    for b, plane in enumerate(planes):
        if sum(p * float(x) for p, x in zip(plane, query)) >= 0:
            qsig |= 1 << b
    probes = [qsig]
    if probe_hamming >= 1:
        probes += [qsig ^ (1 << b) for b in range(n_planes)]
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


class IVFIndex:
    """IVF (inverted-file) ANN: a k-means coarse quantizer assigns every
    vector to a centroid; queries probe only the ``n_probe`` nearest
    centroids' clusters with exact cosine inside.

    The scale path sketched in this module's docstring made concrete:
    ``fit`` is one ML job (sampled), ``assign`` adds the cluster id —
    which doubles as the Iceberg partition column at rest — and
    ``topk`` reads ~n_probe/k of the corpus.
    """

    def __init__(self, k: int = 16, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        self.k = k
        self.seed = seed
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids: list[list[float]] | None = None

    def fit(self, df: DataFrame, sample_fraction: float = 1.0) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = df if sample_fraction >= 1.0 else df.sample(
            fraction=sample_fraction, seed=self.seed
        )
        vecs = train.select(
            array_to_vector(F.col(self.vec_col).cast("array<double>")).alias("features")
        )
        model = KMeans(k=self.k, seed=self.seed).fit(vecs)
        self.centroids = [[float(x) for x in c] for c in model.clusterCenters()]
        return self

    def _nearest_centroids(self, query: list[float], n_probe: int) -> list[int]:
        def dist2(c):
            return sum((a - float(b)) ** 2 for a, b in zip(c, query))

        order = sorted(range(self.k), key=lambda i: dist2(self.centroids[i]))
        return order[:n_probe]

    def assign(self, df: DataFrame) -> DataFrame:
        """Add the coarse cluster id (argmin centroid distance) as a column —
        pure JVM expressions, no ML model needed at assignment time."""
        assert self.centroids is not None, "fit() first"
        best_id = F.lit(0)
        best_d = F.lit(float("inf"))
        for i, c in enumerate(self.centroids):
            carr = F.array(*[F.lit(x) for x in c])
            d = F.aggregate(
                F.zip_with(F.col(self.vec_col), carr,
                           lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            best_id = F.when(d < best_d, F.lit(i)).otherwise(best_id)
            best_d = F.least(d, best_d)
        return df.withColumn("ivf_cluster", best_id)

    def topk(self, df: DataFrame, query: list[float], k: int = 10,
             n_probe: int = 3) -> DataFrame:
        """Approximate top-k: exact cosine over the n_probe nearest
        clusters only."""
        assigned = self.assign(df)
        probes = self._nearest_centroids(query, n_probe)
        cand = assigned.filter(F.col("ivf_cluster").isin(probes))
        return cosine_topk(cand, query, k, self.vec_col, self.id_col)


def cosine_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_planes: int = 12, seed: int = 42, dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join.

    Same-bucket candidates only (sign-LSH collision probability rises with
    cosine), exact cosine verification inside buckets.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig = hyperplane_signature(vec_col, dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("bucket")
    ).cache()
    l, r = b.alias("l"), b.alias("r")
    cos = dot_col(F.col("l.v"), F.col("r.v")) / (
        F.greatest(_norm_col("l.v"), F.lit(1e-12))
        * F.greatest(_norm_col("r.v"), F.lit(1e-12))
    )
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), "cosine")
    )
