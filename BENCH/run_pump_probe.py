"""Round-6 pump payload-encoding probe (VERDICT r5 next-round #5).

Round 5 measured the JVM⇄Python Arrow crossing as bytes-bound and
non-scaling past ~8 threads (pump-only throughput DROPS 8→32), with
batch size ruled out as the lever. This probe tests the remaining
payload-shape lever: the nested list<struct> span column (4 child
arrays + offsets each direction) vs a PACKED single-JSON-string column
(``to_json``/``from_json`` stay JVM-side in WholeStageCodegen).

Four variants, interleaved within ONE session (box-drift protocol:
alternate within seconds, best-of-R):

  pump_struct   pass-through mapInArrow on (doc_id, spans)
  pump_packed   to_json -> pass-through mapInArrow -> from_json
  ext_struct    extract_spans_df (the round-5 production path)
  ext_packed    extract_spans_df_packed

Decision rule (VERDICT): adopt packed behind a flag if ext_packed >=
1.15x ext_struct at 32 cores; else record the negative result in
SCALE.md §3 and close the lever list.

Usage: python BENCH/run_pump_probe.py [--cpus 32] [--replicas 12]
       [--doc-scale 10] [--rounds 3]
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
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=12)
    ap.add_argument("--doc-scale", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkhtml.spark import schemas
    from sparkhtml.spark.pipeline import (
        extract_spans_df,
        extract_spans_df_packed,
    )
    from sparkhtml.spark.session import get_spark

    spark = get_spark(
        app_name="pump-probe", cpus=args.cpus,
        extra_conf={"spark.locality.wait": "0s"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    rep = spark.range(args.replicas).select(F.col("id").alias("rep"))
    body = F.concat(
        F.lit("<h2>Sec</h2><p>"), F.col("text"),
        F.lit("</p><ul><li>one item here<li>two items here</ul>"),
    )
    if args.doc_scale > 1:
        body = F.concat_ws("", F.array_repeat(body, args.doc_scale))
    corpus = docs.crossJoin(rep).select(
        F.concat(F.col("doc_id").cast("string"), F.lit("-"),
                 F.col("rep")).alias("doc_id"),
        F.concat(
            F.lit('<nav><a href="/">home</a> <a href="/x">x</a></nav>'),
            body, F.lit("<footer>foot</footer>"),
        ).alias("text"),
    )
    inter = corpus.select(
        "doc_id",
        F.array(
            F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                     F.lit(None).cast("string").alias("media_ref"),
                     F.lit(0).alias("offset")),
            F.struct(F.lit("media").alias("kind"),
                     F.lit(None).cast("string").alias("text"),
                     F.concat(F.lit("m-"), F.col("doc_id")).alias("media_ref"),
                     F.lit(1).alias("offset")),
        ).alias("spans"),
    ).repartition(args.cpus * 4, "doc_id")
    inter.cache()
    n = inter.count()

    def passthrough(batches):
        yield from batches

    def pump_struct():
        return inter.mapInArrow(passthrough, schema=schemas.SPANS_OUT)

    def pump_packed():
        packed = inter.select(
            "doc_id", F.to_json(F.col("spans")).alias("spans_json")
        ).mapInArrow(passthrough, schema="doc_id string, spans_json string")
        return packed.select(
            "doc_id",
            F.from_json(F.col("spans_json"),
                        schemas.T.ArrayType(schemas.SPAN)).alias("spans"),
        )

    variants = {
        "pump_struct": pump_struct,
        "pump_packed": pump_packed,
        "ext_struct": lambda: extract_spans_df(inter),
        "ext_packed": lambda: extract_spans_df_packed(inter),
    }

    # warmup: spin up every Python worker on both worker code paths
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():  # interleaved A/B/C/D
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
        print(json.dumps({"round": r,
                          **{k: round(v[-1], 3) for k, v in runs.items()}}),
              file=sys.stderr)

    best = {k: min(v) for k, v in runs.items()}
    result = {
        "cpus": args.cpus, "n_docs": n, "doc_scale": args.doc_scale,
        "best_secs": {k: round(v, 3) for k, v in best.items()},
        "docs_per_sec": {k: round(n / v, 1) for k, v in best.items()},
        "all_secs": {k: [round(x, 3) for x in v] for k, v in runs.items()},
        "pump_packed_vs_struct": round(
            best["pump_struct"] / best["pump_packed"], 3),
        "ext_packed_vs_struct": round(
            best["ext_struct"] / best["ext_packed"], 3),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
