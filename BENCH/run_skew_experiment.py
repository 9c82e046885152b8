"""Measured straggler containment (round 6, SCALE.md §4 evidence gap).

SCALE.md §7 admitted the skew story was *encoded but not measured*:
`straggler_split` + the balanced size-salt repartition are exercised for
correctness, but no number showed they actually contain a pathological
tail. This harness builds a deliberately hostile layout and A/Bs the
documented plan against naive scheduling, interleaved in ONE local[N]
session per [[box-drift-bench-protocol]]:

  corpus   N_NORMAL web-page-sized docs (doc-scale ~10, ~4 KB) plus
           N_GIANTS giants (body repeated GIANT_SCALE×, ~100-500× the
           parse cost), ALL GIANTS CLUSTERED into the tail of the
           partition order (sorted-by-size at-rest layout — the shape
           real crawl dumps have) via repartitionByRange on a size key.

  naive    extract over that layout as-is: the giant-heavy final
           partitions straggle the last wave.

  planned  scripts/run_extract.py's exact recipe: straggler_split at
           STRAG_CHARS + size-salt balanced repartition for the normal
           stratum + one-doc-per-task repartition for the giants.

Both variants do identical total parse work; only placement differs.
Output: one JSON line with best-of-REPS wall seconds per variant and
the naive/planned ratio (>1 = containment pays).

Usage: python BENCH/run_skew_experiment.py [--reps 3] [--giants 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--normal", type=int, default=20000)
    ap.add_argument("--giants", type=int, default=12)
    ap.add_argument("--giant-scale", type=int, default=300)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkhtml.spark.partitioning import straggler_split, with_size_salt
    from sparkhtml.spark.pipeline import extract_spans_df
    from sparkhtml.spark.session import get_spark

    spark = get_spark(cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    body = F.concat(
        F.lit("<h2>Sec</h2><p>"), F.col("text"),
        F.lit("</p><ul><li>one item here<li>two items here</ul>"),
    )
    page = F.concat_ws("", F.array_repeat(body, 10))
    n_base = docs.count()
    replicas = max(1, (args.normal + n_base - 1) // n_base)
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    normal = docs.crossJoin(rep).select(
        F.concat(F.col("doc_id").cast("string"), F.lit("-"), F.col("rep")).alias(
            "doc_id"
        ),
        F.concat(F.lit('<nav><a href="/">h</a></nav>'), page).alias("text"),
    )
    giant_body = F.concat_ws("", F.array_repeat(page, args.giant_scale))
    giants = docs.limit(args.giants).select(
        F.concat(F.lit("g-"), F.col("doc_id")).alias("doc_id"),
        giant_body.alias("text"),
    )
    corpus = normal.unionByName(giants)

    def interleave(df):
        return df.select(
            "doc_id",
            F.array(
                F.struct(
                    F.lit("text").alias("kind"), F.col("text").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
            ).alias("spans"),
        )

    # hostile at-rest layout: sorted by size => every giant lands in the
    # last partitions of the range order (crawl dumps and log-structured
    # sinks really do this)
    n_parts = args.cpus * 4
    hostile = (
        corpus.withColumn("_sz", F.length("text"))
        .repartitionByRange(n_parts, F.col("_sz"), F.col("doc_id"))
        .drop("_sz")
    )
    inter = interleave(hostile).cache()
    n = inter.count()

    strag_chars = 200_000

    def run_naive():
        extract_spans_df(inter).write.format("noop").mode("overwrite").save()

    def run_planned():
        norm_df, strag_df = straggler_split(inter, strag_chars)
        balanced = with_size_salt(norm_df).repartition(
            n_parts, "size_bucket", "salt"
        ).drop("size_bucket", "salt")
        extract_spans_df(balanced).write.format("noop").mode(
            "overwrite"
        ).save()
        extract_spans_df(
            strag_df.repartition(max(args.giants, 1))
        ).write.format("noop").mode("overwrite").save()

    # warmup both shapes (worker spin-up, code paths)
    run_naive()
    run_planned()

    times: dict[str, list[float]] = {"naive": [], "planned": []}
    for _ in range(args.reps):
        for name, fn in (("naive", run_naive), ("planned", run_planned)):
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 3))

    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "cpus": args.cpus, "n_docs": n, "giants": args.giants,
        "giant_scale": args.giant_scale,
        "best": best, "all": times,
        "naive_over_planned": round(best["naive"] / best["planned"], 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
