"""The extraction pipeline: Arrow-batched mapInPandas stages + scalar UDFs.

This is the Spark realization of the reference's entry points
(HTMLDocument.m:12-44 → HTMLParser.m:3331-3347), at the reference's own
granularity — one parser per document — amortized over Arrow batches
(SURVEY.md §3.2 "Spark mapping"). No per-row Python UDFs anywhere; every
stage is ``mapInPandas`` or a Series→Series ``pandas_udf``.

Stages:

    documents_interleaved --extract_spans_df--> spans_out (north rule)
    documents_interleaved --parse_nodes_df----> nodes (flattened DOM table)
    any string column     --css_select_udf----> matched node ids / texts
    any string column     --escape/unescape---> X8/X9 scalar functions
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

from ..dom import FlatDOM
from ..escape import escape_series, unescape_series
from ..extract import doc_metrics, extract_main_text, extract_spans
from ..selector import CompiledSelector
from . import schemas
from .partitioning import with_size_salt

# ------------------------------------------------------------------ spans


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (doc_id, spans) → (doc_id, spans) main content.

    ``spans`` arrives as a numpy array of dict rows (Arrow struct list).
    """
    for pdf in batches:
        out_spans = []
        for spans in pdf["spans"]:
            rows = [
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": int(s["offset"]) if s["offset"] is not None else 0,
                }
                for s in spans
            ]
            out_spans.append(extract_spans(rows))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "spans": out_spans})


def extract_spans_df(documents: DataFrame) -> DataFrame:
    """The north-rule pipeline: interleaved docs → main-content spans.

    Column pruning: only (doc_id, spans) enter the exchange; callers can
    carry extra columns by joining back on doc_id (cheaper than shipping
    them through Python).
    """
    return documents.select("doc_id", "spans").mapInPandas(
        _extract_batch, schema=schemas.SPANS_OUT
    )


def extract_spans_balanced(documents: DataFrame, partitions: int) -> DataFrame:
    """Same, but repartitioned by (size_bucket, salt) first so heavy
    documents spread evenly — the skew plan of SURVEY.md §4.3."""
    salted = with_size_salt(documents)
    balanced = salted.repartition(partitions, "size_bucket", "salt")
    return extract_spans_df(balanced)


# ------------------------------------------------------------------ nodes


def _parse_nodes_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "node_id", "parent", "depth", "order", "kind", "tag",
        "ns", "attrs", "text", "subtree",
    ]
    for pdf in batches:
        rows = {c: [] for c in cols}
        for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
            dom = FlatDOM.from_html(html or "")
            n = len(dom)
            rows["doc_id"].extend([doc_id] * n)
            rows["node_id"].extend(range(n))
            rows["parent"].extend(dom.parent)
            rows["depth"].extend(dom.depth)
            rows["order"].extend(dom.order)
            rows["kind"].extend(dom.kind)
            rows["tag"].extend(dom.tag)
            rows["ns"].extend(dom.ns)
            rows["attrs"].extend(
                [{"name": k, "value": v} for k, v in a] for a in dom.attrs
            )
            rows["text"].extend(dom.text)
            rows["subtree"].extend(dom.subtree)
        yield pd.DataFrame(rows)


def parse_nodes_df(df: DataFrame, html_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """html string column → exploded ``nodes`` table (one row per DOM node).

    This is the flattened-DOM table of SURVEY.md §1.1; selector plans from
    :mod:`sparkhtml.spark.queries` run over it with joins/windows.
    """
    src = df.select(F.col(id_col).cast("string").alias("doc_id"),
                    F.col(html_col).alias("html"))
    return src.mapInPandas(_parse_nodes_batch, schema=schemas.NODES)


# ------------------------------------------------------------ scalar UDFs


def make_udfs():
    """Register-able Series→Series pandas UDFs (Arrow path, never per-row).

    Returns a dict name → pandas_udf, and can be attached to a session via
    ``register_udfs(spark)``.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def html_escape(s: pd.Series) -> pd.Series:
        return escape_series(s)

    @pandas_udf(StringType())
    def html_unescape(s: pd.Series) -> pd.Series:
        return unescape_series(s)

    @pandas_udf(StringType())
    def html_text_content(s: pd.Series) -> pd.Series:
        # textContent of the whole document (X2 at document level)
        return s.fillna("").map(
            lambda h: FlatDOM.from_html(h).text_content(0)
        )

    @pandas_udf(StringType())
    def html_extract_main(s: pd.Series) -> pd.Series:
        return s.fillna("").map(extract_main_text)

    return {
        "html_escape": html_escape,
        "html_unescape": html_unescape,
        "html_text_content": html_text_content,
        "html_extract_main": html_extract_main,
    }


def css_select_text_udf(selector: str):
    """css_select_text('<sel>'): per document, tree-order textContent list of
    matching elements. Selector compiled once per executor process
    (HTMLSelector.m:871-882 parity via module-level cache)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _select(s: pd.Series) -> pd.Series:
        cs = CompiledSelector(selector)

        def run(html: str):
            dom = FlatDOM.from_html(html or "")
            return [dom.text_content(i) for i in cs.match_ids(dom)]

        return s.fillna("").map(run)

    return _select


def css_multi_count_udf(selectors: list[str]):
    """Parse each document ONCE, evaluate k selectors over the same flat
    DOM — operator fusion for multi-selector workloads (vs k parses with
    k single-selector UDFs). Returns array<int> aligned with ``selectors``."""
    from pyspark.sql.functions import pandas_udf

    for sel in selectors:  # fail fast at definition, not on executors
        CompiledSelector(sel)

    @pandas_udf(ArrayType(IntegerType()))
    def _multi(s: pd.Series) -> pd.Series:
        compiled = [CompiledSelector(sel) for sel in selectors]

        def run(html: str):
            dom = FlatDOM.from_html(html or "")
            return [len(cs.match_ids(dom)) for cs in compiled]

        return s.fillna("").map(run)

    return _multi


def css_count_udf(selector: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(IntegerType())
    def _count(s: pd.Series) -> pd.Series:
        cs = CompiledSelector(selector)
        return s.fillna("").map(
            lambda h: len(cs.match_ids(FlatDOM.from_html(h)))
        )

    return _count


def register_udfs(spark) -> None:
    for name, udf in make_udfs().items():
        spark.udf.register(name, udf)


# ------------------------------------------------------------- metrics


def _metrics_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in schemas.EXTRACT_METRICS.fields}
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            n_media = sum(1 for s in spans if s["kind"] == "media")
            n_nodes = n_kept = n_words = n_err = depth = 0
            n_out = n_media
            for s in spans:
                if s["kind"] != "text":
                    continue
                dom = FlatDOM.from_html(s["text"] or "", collect_errors=True)
                m = doc_metrics(dom)
                n_nodes += m["n_nodes"]
                n_kept += m["n_kept_words"]
                n_words += m["n_words"]
                n_err += m["n_errors"]
                depth = max(depth, max(dom.depth) if len(dom) else 0)
                if m["n_kept_words"]:
                    n_out += 1
            out["doc_id"].append(doc_id)
            out["n_spans_in"].append(len(spans))
            out["n_spans_out"].append(n_out)
            out["n_media"].append(n_media)
            out["n_nodes"].append(n_nodes)
            out["n_kept_words"].append(n_kept)
            out["n_words"].append(n_words)
            out["n_errors"].append(n_err)
            out["max_depth"].append(depth)
        yield pd.DataFrame(out)


def extract_metrics_df(documents: DataFrame) -> DataFrame:
    """Per-document metrics table (lineage layer, SURVEY.md §4.3)."""
    return documents.select("doc_id", "spans").mapInPandas(
        _metrics_batch, schema=schemas.EXTRACT_METRICS
    )
