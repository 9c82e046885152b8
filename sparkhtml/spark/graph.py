"""Distributed connected components (min-label propagation).

Training-data-pipeline layer: near-duplicate PAIRS (MinHash/SimHash/
cosine LSH output) are only half the dedup story — the drop decision
needs CLUSTERS: the transitive closure of the pair relation, one
canonical representative per component. This is the standard min-label
propagation: every vertex starts as its own label, each round takes the
min of its neighbors' labels, converged when nothing changes.

Scale posture: each round is one shuffled join + aggregate on the EDGE
relation (the pair list — orders of magnitude smaller than the corpus);
rounds needed = graph diameter, and near-dup graphs are shallow (dup
clusters are cliques or near-cliques from the LSH band join, so 2-4
rounds converge). Labels persist per round and unpersist after the next
— no lineage blowup. The convergence check is one count per round; the
``max_iter`` bound caps pathological chains (a 10^6-long path graph is
not a plausible dup structure, but the bound keeps the job finite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, a_col: str = "a", b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(a, b) undirected edge list → (id, component) where ``component``
    is the smallest vertex id in the connected component.

    Vertices are the ids appearing in the edge list; isolated corpus
    rows (no near-dup pair) are by definition their own singleton
    cluster and never enter the computation — join the result back
    against the corpus with ``coalesce(component, id)``.
    """
    a, b = F.col(a_col), F.col(b_col)
    sym = edges.select(a.alias("src"), b.alias("dst")).unionByName(
        edges.select(b.alias("src"), a.alias("dst"))
    )
    sym = sym.repartition("src").persist()
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        # Each round combines the neighbor min with a POINTER JUMP (the
        # min of my label's own label): label chains halve every round,
        # so convergence is O(log diameter) rounds, not O(diameter).
        # localCheckpoint(eager) truncates lineage per round — without it
        # the stacked plans make round N's ANALYSIS cost O(N²). On a
        # lost-executor-prone cluster swap for reliable checkpoint(); the
        # round structure is identical.
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym["dst"] == labels["id"])
                .groupBy("src")
                .agg(F.min("lbl").alias("_nbr"))
            )
            l2 = labels.select(
                F.col("id").alias("_jid"), F.col("lbl").alias("_jlbl")
            )
            stepped = (
                labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
                .join(l2, labels["lbl"] == l2["_jid"], "left")
                .select(
                    labels["id"],
                    F.col("lbl").alias("_old"),
                    F.least(
                        F.col("lbl"),
                        F.coalesce(F.col("_nbr"), F.col("lbl")),
                        F.coalesce(F.col("_jlbl"), F.col("lbl")),
                    ).alias("lbl"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                stepped.filter(F.col("lbl") != F.col("_old")).limit(1).count()
            )
            labels = stepped.drop("_old")
            if changed == 0:
                break
        return labels.select(F.col("id"), F.col("lbl").alias("component"))
    finally:
        sym.unpersist()


def dedup_clusters(
    corpus: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a_col: str = "a", b_col: str = "b", max_iter: int = 20,
) -> DataFrame:
    """Corpus + near-dup pairs → (id, cluster, is_canonical).

    ``cluster`` = component min id (rows without a pair are their own
    singleton); ``is_canonical`` marks the keep-one representative. This
    is the final join of the documented dedup pipeline (SCALE.md §5):
    exact dedup → LSH pairs → components → drop non-canonical rows.
    """
    comp = connected_components(pairs, a_col, b_col, max_iter)
    ids = corpus.select(F.col(id_col).alias("id"))
    out = ids.join(comp, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("cluster"),
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster"))


def cluster_survivors(
    clustered: DataFrame, quality_col: str, id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Quality-aware survivor selection (round 6): within each dedup
    cluster keep the HIGHEST-``quality_col`` row (ties broken by
    ``id_col`` ascending), not the min-id row — ``dedup_clusters``'s
    ``is_canonical`` is positional, which throws away the best copy of
    a near-dup family; this is the curation-correct final step of the
    SCALE.md §5 pipeline (exact dedup → LSH pairs → components → keep
    best per family).

    Input is ``dedup_clusters`` output joined with any per-doc quality
    signal; returns the input columns plus ``survivor_rank`` filtered
    to rank 1. ONE window shuffle on the cluster key; singleton
    clusters (the overwhelming majority at corpus scale) pass through
    with rank 1, and AQE skew handling covers boilerplate
    mega-clusters.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    return (
        clustered.withColumn("survivor_rank", F.row_number().over(w))
        .filter(F.col("survivor_rank") == 1)
    )
