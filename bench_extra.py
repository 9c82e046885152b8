"""Plan capture + per-query isolation harness for the optimization round.

bench.py is FROZEN for measurement (the driver times the round-start
copy), so everything exploratory lives here: builds the SAME query
frames as bench.py, then

    --plans DIR   write .explain("formatted") for every query to
                  DIR/<query>_<tag>.txt  (tag: --tag before|after)
    --time NAME   noop-isolated interleaved best-of-reps timing for a
                  subset of queries (comma list or 'all')

Usage:
    python bench_extra.py --plans plans/r07 --tag before
    python bench_extra.py --time q1_extract_spans,q6_quality_features
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_queries(spark, sf_dir: str, cpus: int):
    """Same inputs and frames as bench.py (kept in lockstep by hand —
    bench.py is frozen; this builder mirrors its call sites exactly)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from sparkhtml.spark import links as _links
    from sparkhtml.spark import textstats as _textstats
    from sparkhtml.spark.dedup import minhash_lsh_pairs
    from sparkhtml.spark.pdf import pdf_extract_df
    from sparkhtml.spark.pipeline import extract_spans_df, parse_nodes_df
    from sparkhtml.spark.queries import css_select_df
    from sparkhtml.spark.similarity import cosine_topk_vs
    from sparkhtml.spark.textstats import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    interleaved = entry._interleaved(spark, sf_dir)
    interleaved.cache().count()

    html_df = docs.select(
        "doc_id",
        F.concat(
            F.lit('<div class="wrap" data-q="2"><p id="main">'), F.col("text"),
            F.lit('</p><a href="/l">link</a></div>'),
        ).alias("html"),
    )
    html_df_q3 = docs.select(
        "doc_id",
        F.concat(
            F.lit('<div class="wrap"><p id="main">'), F.col("text"),
            F.lit('</p><a href="/l">link</a></div>'),
        ).alias("html"),
    )
    nodes = parse_nodes_df(html_df)
    nodes_cached = parse_nodes_df(html_df_q3).cache()
    nodes_cached.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.orderBy("vec_id").limit(1)

    def _render_pdfs(batches):
        import re as _re

        import pandas as pd

        from sparkhtml.spark.pdf import build_pdf

        for b in batches:
            out = []
            for i, text in zip(b["doc_id"].tolist(), b["text"].tolist()):
                words = _re.sub(r"[^ -~]", " ", text or "").split()[:120]
                items = [("text", " ".join(words[:60]))]
                if int(i) % 3 == 0:
                    items.append(("image",))
                if words[60:]:
                    items.append(("text", " ".join(words[60:])))
                out.append((str(i), bytearray(build_pdf([items]))))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    pdf_blobs = docs.select("doc_id", "text").repartition(cpus).mapInPandas(
        _render_pdfs, "doc_id string, payload binary").cache()
    pdf_blobs.count()

    frames = {
        "q1_extract_spans": lambda: extract_spans_df(interleaved),
        "q2_parse_nodes": lambda: nodes,
        "q3_css_child_plan": lambda: css_select_df(
            nodes_cached, "div.wrap > p#main"
        ),
        "q4_minhash_dedup": lambda: minhash_lsh_pairs(docs, min_agree=0.9),
        "q5_cosine_topk": lambda: cosine_topk_vs(emb, qdf, 10),
        "q6_quality_features": lambda: quality_features(docs),
        "q7_extract_links": lambda: _links.extract_links_df(nodes_cached),
        "q8_text_cleanup": lambda: _textstats.text_cleanup(docs),
        "q9_pdf_extract": lambda: pdf_extract_df(pdf_blobs),
    }
    # q3/q5 consume via count()/collect() in bench.py; everything else via
    # a noop write. Mirror that so timings here match bench.py semantics.
    actions = {
        "q3_css_child_plan": lambda df: df.count(),
        "q5_cosine_topk": lambda df: df.collect(),
    }
    return frames, actions, n_docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir to write plans into")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--time", default=None,
                    help="comma list of query names, or 'all'")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sparkhtml.spark.session import get_spark

    spark = get_spark(app_name="sparkhtml-bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    frames, actions, n_docs = build_queries(spark, sf_dir, cpus)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name, thunk in frames.items():
            df = thunk()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")

    if args.time:
        names = (
            list(frames) if args.time == "all" else args.time.split(",")
        )

        def noop_write(df):
            df.write.format("noop").mode("overwrite").save()

        timings: dict[str, float] = {}
        cold: dict[str, float] = {}
        for rep in range(args.reps):
            for name in names:
                spark.sparkContext.setJobDescription(f"{name} rep{rep}")
                act = actions.get(name, noop_write)
                t0 = time.perf_counter()
                act(frames[name]())
                dt = time.perf_counter() - t0
                if rep == 0:
                    cold[name] = round(dt, 3)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
        timings = {k: round(v, 3) for k, v in timings.items()}
        print(json.dumps({
            "queries": timings, "queries_cold_rep1": cold,
            "sf": sf_dir, "cpus": cpus, "reps": args.reps,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
