"""K-independent-JVMs experiment, PDF tier (round 6).

The HTML K-JVM experiment (run_kjvm_experiment.py, round 5) REFUTED the
sharding hypothesis for the pump-bound HTML path: 4×local[8] aggregated
below one local[32]. The PDF tier is compute-bound (ms/doc of pure
Python per row, tiny Arrow crossing), and the 80k-doc band measured
Spark-at-8-cores = 1.00 of silicon vs 0.72 at 32 — so HERE sharding
should recover the gap if the 32-core loss is single-fat-JVM pressure.

Arms, interleaved per batch (box-drift protocol):

  mono     one local[32] JVM over all shards
  sharded  4 concurrent independent local[8] JVMs (taskset-pinned to
           disjoint core sets), disjoint quarter-shards, barrier-
           released; aggregate = total docs / (last end - first start)
  control  raw multiprocessing pdf_doc_spans at 32 procs

Claim proven if sharded ≈ control ≫ mono; refuted if sharded ≈ mono.

Usage: python BENCH/run_kjvm_pdf.py [--batches 2] [--replicas 8]
           [--sf /root/testdata/sf0.1] [--k 4] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP = r"""
import re, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from sparkhtml.spark.session import get_spark

sf_dir, out_dir = sys.argv[1], sys.argv[2]
replicas, k = int(sys.argv[3]), int(sys.argv[4])
spark = get_spark(app_name="kjvm-pdf-prep", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
rep = spark.range(replicas).select(F.col("id").alias("rep"))
corpus = docs.crossJoin(rep).select(
    F.concat(F.col("doc_id").cast("string"), F.lit("-"),
             F.col("rep")).alias("doc_id"),
    F.col("text"),
    F.pmod(F.xxhash64(F.concat(F.col("doc_id").cast("string"), F.lit("-"),
                               F.col("rep"))), F.lit(k)).alias("shard"),
).repartition(32)

def render(batches):
    import pandas as pd
    from sparkhtml.spark.pdf import build_pdf
    for b in batches:
        out = []
        for i, text, sh in zip(b["doc_id"].tolist(), b["text"].tolist(),
                               b["shard"].tolist()):
            words = re.sub(r"[^ -~]", " ", text or "").split()[:120]
            items = [("text", " ".join(words[:60]))]
            if int(i.split("-")[0]) %% 3 == 0:
                items.append(("image",))
            if words[60:]:
                items.append(("text", " ".join(words[60:])))
            out.append((i, bytearray(build_pdf([items])), int(sh)))
        yield pd.DataFrame(out, columns=["doc_id", "payload", "shard"])

blobs = corpus.mapInPandas(
    render, "doc_id string, payload binary, shard int")
for s in range(k):
    (blobs.filter(F.col("shard") == s).drop("shard")
     .repartition(8).write.mode("overwrite").parquet(f"{out_dir}/shard_{s}"))
spark.stop()
print("PREP-DONE")
""" % {"repo": REPO}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from sparkhtml.spark.session import get_spark
from sparkhtml.spark.pdf import pdf_extract_df

cpus = int(sys.argv[1]); paths = sys.argv[2].split(","); tag = sys.argv[3]
barrier_dir = sys.argv[4]
spark = get_spark(app_name=f"kjvm-pdf-{tag}", cpus=cpus,
                  extra_conf={"spark.locality.wait": "0s"})
spark.sparkContext.setLogLevel("ERROR")
blobs = spark.read.parquet(*paths).repartition(cpus * 4, "doc_id")
blobs.cache()
n = blobs.count()
pdf_extract_df(blobs).write.format("noop").mode("overwrite").save()
open(os.path.join(barrier_dir, f"ready_{tag}"), "w").write("1")
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.02)
passes = []
for _ in range(2):
    t0 = time.time()
    pdf_extract_df(blobs).write.format("noop").mode("overwrite").save()
    passes.append({"start": t0, "end": time.time()})
print(json.dumps({"tag": tag, "cpus": cpus, "n_docs": n, "passes": passes}))
spark.stop()
""" % {"repo": REPO}

CONTROL = r"""
import json, os, sys, time
import multiprocessing as mp
sys.path.insert(0, %(repo)r)

BLOBS = []
NCHUNKS = 1

def _work(i):
    from sparkhtml.spark.pdf import pdf_doc_spans
    n = 0
    for b in BLOBS[i::NCHUNKS]:
        pdf_doc_spans(b)
        n += 1
    return n

if __name__ == "__main__":
    cpus = int(sys.argv[1]); paths = sys.argv[2].split(",")
    import pyarrow.parquet as pq
    for p in paths:
        t = pq.read_table(p, columns=["payload"])
        BLOBS.extend(v.as_py() for v in t.column("payload"))
    BLOBS = [bytes(b) for b in BLOBS]
    NCHUNKS = cpus * 4
    with mp.Pool(cpus) as pool:
        pool.map(_work, range(cpus))
        passes = []
        total = 0
        for _ in range(2):
            t0 = time.time()
            total = sum(pool.map(_work, range(NCHUNKS)))
            passes.append({"start": t0, "end": time.time()})
    print(json.dumps({"tag": "control", "cpus": cpus, "n_docs": total,
                      "passes": passes}))
""" % {"repo": REPO}


def _parse_json(out) -> dict:
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


def run_mono(cpus: int, paths: list[str]) -> dict:
    with tempfile.TemporaryDirectory() as bd:
        open(os.path.join(bd, "go"), "w").write("1")
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), ",".join(paths),
             "mono", bd],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
    r = _parse_json(out)
    best = min(p["end"] - p["start"] for p in r["passes"])
    return {"arm": "mono", "n_docs": r["n_docs"], "secs": round(best, 2),
            "docs_per_sec": round(r["n_docs"] / best, 1)}


def run_sharded(k: int, cpus_each: int, out_dir: str) -> dict:
    bd = tempfile.mkdtemp(prefix="kjvm_pdf_barrier_")
    have_taskset = shutil.which("taskset") is not None
    procs = []
    try:
        for s in range(k):
            cmd = [sys.executable, "-c", WORKER, str(cpus_each),
                   f"{out_dir}/shard_{s}", f"s{s}", bd]
            if have_taskset:
                lo = s * cpus_each
                cmd = ["taskset", "-c", f"{lo}-{lo + cpus_each - 1}"] + cmd
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=REPO))
        deadline = time.time() + 900
        while time.time() < deadline:
            if all(os.path.exists(os.path.join(bd, f"ready_s{s}"))
                   for s in range(k)):
                break
            dead = [p for p in procs if p.poll() is not None]
            if dead:
                # kill the live shards FIRST — they spin on the never-
                # written "go" file, and communicate() on a live one
                # would block forever
                for p in procs:
                    if p.poll() is None:
                        p.kill()
                raise RuntimeError("a shard JVM died before the barrier: "
                                   + dead[0].communicate()[1][-2000:])
            time.sleep(0.05)
        else:
            raise RuntimeError("barrier timeout")
        open(os.path.join(bd, "go"), "w").write("1")
        results = []
        for p in procs:
            so, se = p.communicate(timeout=3600)
            lines = [l for l in so.strip().splitlines()
                     if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"shard failed: {se[-3000:]}")
            results.append(json.loads(lines[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        shutil.rmtree(bd, ignore_errors=True)
    total = sum(r["n_docs"] for r in results)
    per_pass = []
    for i in range(2):
        start = min(r["passes"][i]["start"] for r in results)
        end = max(r["passes"][i]["end"] for r in results)
        per_pass.append(end - start)
    best = min(per_pass)
    return {"arm": f"{k}x local[{cpus_each}]"
                   + (" pinned" if have_taskset else " UNPINNED"),
            "n_docs": total, "secs": round(best, 2),
            "docs_per_sec": round(total / best, 1),
            "per_jvm_docs_per_sec": [
                round(r["n_docs"] / min(p["end"] - p["start"]
                                        for p in r["passes"]), 1)
                for r in results]}


def run_control(cpus: int, paths: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CONTROL, str(cpus), ",".join(paths)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    r = _parse_json(out)
    best = min(p["end"] - p["start"] for p in r["passes"])
    return {"arm": f"control[{cpus}]", "n_docs": r["n_docs"],
            "secs": round(best, 2),
            "docs_per_sec": round(r["n_docs"] / best, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    out_dir = tempfile.mkdtemp(prefix="kjvm_pdf_corpus_")
    try:
        prep = subprocess.run(
            [sys.executable, "-c", PREP, args.sf, out_dir,
             str(args.replicas), str(args.k)],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        if "PREP-DONE" not in prep.stdout:
            raise RuntimeError(f"prep failed: {prep.stderr[-3000:]}")
        all_paths = [f"{out_dir}/shard_{s}" for s in range(args.k)]
        batches = []
        for b in range(args.batches):
            batch = {
                "mono": run_mono(args.cpus, all_paths),
                "sharded": run_sharded(args.k, args.cpus // args.k, out_dir),
                "control": run_control(args.cpus, all_paths),
            }
            batches.append(batch)
            print(json.dumps({"batch": b, **batch}))
        best = {arm: max((b[arm] for b in batches),
                         key=lambda r: r["docs_per_sec"])
                for arm in ("mono", "sharded", "control")}
        summary = {
            "best": best,
            "sharded_vs_mono": round(
                best["sharded"]["docs_per_sec"]
                / best["mono"]["docs_per_sec"], 3),
            "sharded_vs_control": round(
                best["sharded"]["docs_per_sec"]
                / best["control"]["docs_per_sec"], 3),
            "mono_vs_control": round(
                best["mono"]["docs_per_sec"]
                / best["control"]["docs_per_sec"], 3),
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
