"""PDF-tier scaling evidence: pdf_extract_df at local[N] vs local[4N].

Same protocol as BENCH/run_scaling.py (subprocess per leg — a JVM can't
change master; interleaved rounds; optional raw-multiprocessing hardware
control), applied to the PDF/layout tier. Blobs are rendered in Spark
workers OUTSIDE timing (repartition(cpus*4) — the render is scaffolding,
the operator under measure is parse + layout + span assembly). Unlike the
HTML bench corpus (~170 µs/doc, pump-bound at small scale), PDF parse is
~2-4 ms/doc of pure Python compute per row, so this band probes the
compute-bound regime the 100 TB design actually lives in.

Usage: python BENCH/run_pdf_scaling.py [--n 8] [--sf /root/testdata/sf0.1]
                                       [--replicas 4] [--rounds 1] [--control]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, re, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from sparkhtml.spark.session import get_spark
from sparkhtml.spark.pdf import pdf_extract_df

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
spark = get_spark(app_name="pdf-scaling-%%d" %% cpus, cpus=cpus,
                  extra_conf={"spark.locality.wait": "0s"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
rep = spark.range(replicas).select(F.col("id").alias("rep"))
corpus = docs.crossJoin(rep).select(
    F.concat(F.col("doc_id").cast("string"), F.lit("-"), F.col("rep")).alias("doc_id"),
    F.col("text"),
).repartition(cpus * 4, "doc_id")

def render(batches):
    import pandas as pd
    from sparkhtml.spark.pdf import build_pdf
    for b in batches:
        out = []
        for i, text in zip(b["doc_id"].tolist(), b["text"].tolist()):
            words = re.sub(r"[^ -~]", " ", text or "").split()[:120]
            items = [("text", " ".join(words[:60]))]
            if int(i.split("-")[0]) %% 3 == 0:
                items.append(("image",))
            if words[60:]:
                items.append(("text", " ".join(words[60:])))
            out.append((i, bytearray(build_pdf([items]))))
        yield pd.DataFrame(out, columns=["doc_id", "payload"])

blobs = corpus.mapInPandas(render, "doc_id string, payload binary").cache()
n = blobs.count()
# warmup: spin up every Python worker so timed runs are steady-state
pdf_extract_df(blobs).write.format("noop").mode("overwrite").save()
dt = None
for _ in range(2):
    t0 = time.perf_counter()
    pdf_extract_df(blobs).write.format("noop").mode("overwrite").save()
    d = time.perf_counter() - t0
    dt = d if dt is None else min(dt, d)
print(json.dumps({"cpus": cpus, "n_docs": n, "secs": round(dt, 2),
                  "docs_per_sec": round(n / dt, 1)}))
spark.stop()
""" % {"repo": REPO}


CONTROL = r"""
# Hardware control: the SAME parse via raw multiprocessing — no JVM, no
# Arrow, no scheduler — measuring the all-core silicon ceiling.
import json, re, sys, time
import multiprocessing as mp
sys.path.insert(0, %(repo)r)

def _render(args):
    ids, texts = args
    from sparkhtml.spark.pdf import build_pdf
    out = []
    for i, text in zip(ids, texts):
        words = re.sub(r"[^ -~]", " ", text or "").split()[:120]
        items = [("text", " ".join(words[:60]))]
        if int(str(i).split("-")[0]) %% 3 == 0:
            items.append(("image",))
        if words[60:]:
            items.append(("text", " ".join(words[60:])))
        out.append(bytes(build_pdf([items])))
    return out

def _parse(args):
    blobs, = args
    from sparkhtml.spark.pdf import pdf_doc_spans
    n = 0
    for b in blobs:
        pdf_doc_spans(b)
        n += 1
    return n

if __name__ == "__main__":
    cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
    import pyarrow.parquet as pq
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [f"{d}-{r}" for r in range(replicas)
           for d in base.column("doc_id").to_pylist()]
    texts = base.column("text").to_pylist() * replicas
    with mp.Pool(cpus) as pool:
        rchunks = [(ids[i::cpus], texts[i::cpus]) for i in range(cpus)]
        blobs = [b for chunk in pool.map(_render, rchunks) for b in chunk]
        chunks = [(blobs[i::cpus * 4],) for i in range(cpus * 4)]
        pool.map(_parse, chunks[:cpus])  # warmup imports
        dt = None
        for _ in range(2):
            t0 = time.perf_counter()
            total = sum(pool.map(_parse, chunks))
            d = time.perf_counter() - t0
            dt = d if dt is None else min(dt, d)
    print(json.dumps({"cpus": cpus, "n_docs": total, "secs": round(dt, 2),
                      "docs_per_sec": round(total / dt, 1)}))
""" % {"repo": REPO}


def run(cpus: int, sf_dir: str, replicas: int, control: bool = False) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CONTROL if control else WORKER,
         str(cpus), sf_dir, str(replicas)],
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
    ap.add_argument("--replicas", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--control", action="store_true")
    args = ap.parse_args()

    lows, highs, clows, chighs = [], [], [], []
    for _ in range(args.rounds):
        lows.append(run(args.n, args.sf, args.replicas))
        highs.append(run(args.n * 4, args.sf, args.replicas))
        if args.control:
            clows.append(run(args.n, args.sf, args.replicas, control=True))
            chighs.append(run(args.n * 4, args.sf, args.replicas, control=True))
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

    stamp = datetime.date.today().isoformat()
    md = f"""

## PDF-tier scaling band N={args.n} → 4N={args.n * 4} ({stamp}, auto-appended)

`pdf_extract_df` (parse + layout + span assembly, blobs pre-rendered and
cached outside timing) over {lo['n_docs']:,} docs derived from {args.sf}:

| config | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[{lo['cpus']}] | {lo['n_docs']:,} | {lo['secs']} | {lo['docs_per_sec']:,} |
| local[{hi['cpus']}] | {hi['n_docs']:,} | {hi['secs']} | {hi['docs_per_sec']:,} |

**Scaling efficiency = {result['scaling_efficiency']}**
"""
    if args.control:
        md += f"""
Control (same parse, raw multiprocessing): {result['control_low']['docs_per_sec']:,} →
{result['control_high']['docs_per_sec']:,} docs/s, efficiency
{result['control_efficiency']}; **Spark at {result['efficiency_vs_control']}
of the silicon ceiling.**
"""
    md += f"""
Reproduce: `python BENCH/run_pdf_scaling.py --n {args.n} --sf {args.sf}
--replicas {args.replicas} --rounds {args.rounds}\
{' --control' if args.control else ''}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
