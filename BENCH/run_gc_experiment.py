"""High-core-band JVM isolation experiment (VERDICT r3 next-round #6).

Round-3 decomposition localized the 8→32 scaling shortfall to the single
shared JVM under 32 concurrent Arrow streams (Spark-vs-control fell from
85% at 8 cores to 53% at 32; task.cpus / local[24] / local-cluster
experiments ruled out core oversubscription). The surviving hypothesis is
allocator/GC pressure: every Arrow batch pumped JVM→Python→JVM allocates
off-heap + on-heap transfer buffers on 32 threads at once.

This runs the SAME extraction job at local[8] and local[32] under
different collector/heap configs, interleaved within each round so box
drift hits all variants equally, with the multiprocessing control as the
silicon ceiling. Usage:

    python BENCH/run_gc_experiment.py [--replicas 8] [--doc-scale 10]
                                      [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from sparkhtml.spark.session import get_spark
from sparkhtml.spark.pipeline import extract_spans_df

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
doc_scale = int(sys.argv[4]); jvm_opts = sys.argv[5]
extra = {"spark.locality.wait": "0s"}
if jvm_opts != "-":
    extra["spark.driver.extraJavaOptions"] = jvm_opts
spark = get_spark(app_name="gc-exp-%%d" %% cpus, cpus=cpus, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
rep = spark.range(replicas).select(F.col("id").alias("rep"))
body = F.concat(
    F.lit('<h2>Sec</h2><p>'), F.col("text"),
    F.lit('</p><ul><li>one item here<li>two items here</ul>'),
)
if doc_scale > 1:
    body = F.concat_ws("", F.array_repeat(body, doc_scale))
corpus = docs.crossJoin(rep).select(
    F.concat(F.col("doc_id").cast("string"), F.lit("-"), F.col("rep")).alias("doc_id"),
    F.concat(
        F.lit('<nav><a href="/">home</a> <a href="/x">x</a></nav>'),
        body, F.lit('<footer>foot</footer>'),
    ).alias("text"),
)
inter = corpus.select(
    "doc_id",
    F.array(
        F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                 F.lit(None).cast("string").alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
                 F.concat(F.lit("m-"), F.col("doc_id")).alias("media_ref"), F.lit(1).alias("offset")),
    ).alias("spans"),
).repartition(cpus * 4, "doc_id")
inter.cache()
n = inter.count()
extract_spans_df(inter).write.format("noop").mode("overwrite").save()  # warmup
dt = None
for _ in range(2):
    t0 = time.perf_counter()
    extract_spans_df(inter).write.format("noop").mode("overwrite").save()
    d = time.perf_counter() - t0
    dt = d if dt is None else min(dt, d)
print(json.dumps({"cpus": cpus, "n_docs": n, "secs": round(dt, 2),
                  "docs_per_sec": round(n / dt, 1)}))
spark.stop()
""" % {"repo": REPO}


CONFIGS = {
    # Java 17's default collector, pinned explicitly: get_spark now opts
    # high-core local JVMs into ParallelGC (the winner of this experiment),
    # so "-" would no longer measure G1
    "default": "-XX:+UseG1GC",
    "parallel": "-XX:+UseParallelGC",
    "g1_tuned": "-XX:+UseG1GC -XX:G1HeapRegionSize=16m "
                "-XX:InitiatingHeapOccupancyPercent=60",
    "zgc": "-XX:+UseZGC",
}


def run(cpus: int, sf_dir: str, replicas: int, doc_scale: int,
        jvm_opts: str, control: bool = False) -> dict:
    if control:
        sys.path.insert(0, os.path.join(REPO, "BENCH"))
        from run_scaling import CONTROL

        code, argv = CONTROL, [str(cpus), sf_dir, str(replicas), str(doc_scale)]
    else:
        code = WORKER
        argv = [str(cpus), sf_dir, str(replicas), str(doc_scale), jvm_opts]
    out = subprocess.run(
        [sys.executable, "-c", code, *argv],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--doc-scale", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--configs", default="default,parallel,g1_tuned")
    args = ap.parse_args()

    names = [c for c in args.configs.split(",") if c in CONFIGS]
    results: dict[str, dict[int, list[float]]] = {
        c: {8: [], 32: []} for c in names
    }
    control: dict[int, list[float]] = {8: [], 32: []}
    crep = max(1, args.replicas // 4)
    for r in range(args.rounds):
        for c in names:  # interleave all variants within the round
            for cpus in (8, 32):
                res = run(cpus, args.sf, args.replicas, args.doc_scale,
                          CONFIGS[c])
                results[c][cpus].append(res["docs_per_sec"])
                print(f"round {r} {c} local[{cpus}]: "
                      f"{res['docs_per_sec']:,} docs/s", flush=True)
        for cpus in (8, 32):
            res = run(cpus, args.sf, crep, args.doc_scale, "-", control=True)
            control[cpus].append(res["docs_per_sec"])
            print(f"round {r} control {cpus}p: "
                  f"{res['docs_per_sec']:,} docs/s", flush=True)

    summary = {}
    ctl = {c: max(v) for c, v in control.items()}
    ctl_eff = ctl[32] / (4 * ctl[8])
    for c in names:
        lo, hi = max(results[c][8]), max(results[c][32])
        eff = hi / (4 * lo)
        summary[c] = {
            "local8": lo, "local32": hi, "efficiency": round(eff, 3),
            "vs_control": round(eff / ctl_eff, 3),
        }
    out = {"configs": summary,
           "control": {"p8": ctl[8], "p32": ctl[32],
                       "efficiency": round(ctl_eff, 3)},
           "doc_scale": args.doc_scale, "rounds": args.rounds,
           "raw": {c: results[c] for c in names}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
