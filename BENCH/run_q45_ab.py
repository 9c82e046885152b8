"""Round-6 attribution of the BENCH_r05 q4/q5 regression (VERDICT #1).

Round-5 facts: q4_minhash_dedup 1.254->2.149 s and q5_cosine_topk
0.193->0.363 s vs round 4. `dedup.py`/`similarity.py` are byte-identical
to r4 — but bench.py's **q5 call site changed**: r4 timed
`cosine_topk(emb, literal_vector)` while r5 timed
`cosine_topk_vs(emb, broadcast_1row_frame)` (the r4-VERDICT-#6 dogfood
swap). So q5 has a real plan-shape suspect (extra BroadcastExchange +
BroadcastNestedLoopJoin per run) on top of window drift; q4 has no code
or call-site change at all.

This harness interleaves, within ONE local[32] session (box-drift
protocol, [[box-drift-bench-protocol]]):

    q4        minhash_lsh_pairs(docs, 0.9).count()   (identical r4/r5)
    q5_lit    cosine_topk(emb, qv, 10).collect()     (r4 call shape)
    q5_vs     cosine_topk_vs(emb, qdf, 10).collect() (r5 call shape)

The first three q4 reps double as the calm-window probe (spread <= ~5%
= calm). Verdict rule: q4 best <= ~1.4 s and q5 best <= ~0.25 s in a
calm window clears the drift hypothesis; a persistent q5_vs-vs-q5_lit
gap attributes q5 to the call-site change instead.

Usage: python BENCH/run_q45_ab.py [--rounds 6]
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
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from sparkhtml.spark.dedup import minhash_lsh_pairs
    from sparkhtml.spark.session import get_spark
    from sparkhtml.spark.similarity import cosine_topk, cosine_topk_vs

    spark = get_spark(app_name="q45-ab", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    qdf = emb.orderBy("vec_id").limit(1)

    variants = {
        "q4": lambda: minhash_lsh_pairs(docs, min_agree=0.9).count(),
        "q5_lit": lambda: cosine_topk(emb, qv, 10).collect(),
        "q5_vs": lambda: cosine_topk_vs(emb, qdf, 10).collect(),
    }
    for fn in variants.values():  # warmup
        fn()

    runs: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            runs[name].append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"round": r, **{k: v[-1] for k, v in runs.items()}}),
              file=sys.stderr)

    result = {
        "cpus": args.cpus,
        "best": {k: min(v) for k, v in runs.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in runs.items()},
        "all": runs,
        "q5_vs_over_lit": round(min(runs["q5_vs"]) / min(runs["q5_lit"]), 3),
        "r4_reference": {"q4": 1.254, "q5": 0.193},
        "r5_recorded": {"q4": 2.149, "q5": 0.363},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
