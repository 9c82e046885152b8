"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.6) and the north rule's
"resumable from checkpoint" is realized by :mod:`.checkpoint` for batch;
this module adds the streaming face of the same pipeline for continuous
ingest:

- :func:`stream_extract` — file-stream of interleaved documents →
  the same ``extract_spans_df`` stage → parquet sink, exactly-once via
  Spark's own streaming checkpoint; ``Trigger.AvailableNow`` drains the
  backlog then stops (the batch-with-streaming-bookkeeping mode).
- :func:`stream_quality_metrics` — event-time windowed aggregation with a
  watermark (late-data bound), the canonical stateful op.
- :func:`stream_dedup_exact` — drop-duplicates-within-watermark over the
  document fingerprint, the streaming form of exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas
from .pipeline import extract_spans_df


def read_document_stream(
    spark: SparkSession, in_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(schemas.DOCUMENTS_INTERLEAVED).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(in_dir)


def stream_extract(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous (or drain-and-stop) extraction: same mapInPandas stage as
    batch; the streaming checkpoint gives exactly-once file-level resume."""
    stream = read_document_stream(spark, in_dir)
    out = extract_spans_df(stream)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quality_metrics(
    docs_with_ts: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Windowed per-window extraction metrics with a late-data watermark.

    Input: streaming DataFrame (ts: timestamp, doc_id, n_words: int).
    """
    return (
        docs_with_ts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_docs",
            "n_words",
        )
    )


def stateful_source_stats(
    docs_with_ts: DataFrame, state_timeout_ms: int = 3_600_000
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-source
    running totals (docs seen, words seen, duplicates seen by fingerprint)
    maintained in group state across micro-batches.

    Input: streaming (ts timestamp, source string, doc_id long, text string).
    Emits one row per (source, micro-batch) with the updated totals —
    the streaming face of the lineage/metrics layer. State per group is a
    triple + a bounded fingerprint set; the timeout reaps idle sources.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "source string, n_docs long, n_words long, n_dups long"
    state_schema = "n_docs long, n_words long, n_dups long, fps array<long>"

    def update(key, pdfs, state: GroupState):
        (source,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n_docs, n_words, n_dups, fps = (
            state.get if state.exists else (0, 0, 0, [])
        )
        seen = set(fps)
        for pdf in pdfs:
            for text in pdf["text"]:
                toks = (text or "").lower().split()
                n_docs += 1
                n_words += len(toks)
                # stable across executors (builtin hash() is salted)
                fp = int.from_bytes(
                    hashlib.blake2b(" ".join(toks).encode(),
                                    digest_size=8).digest(), "big"
                ) >> 1
                if fp in seen:
                    n_dups += 1
                elif len(seen) < 100_000:  # bound state size
                    seen.add(fp)
        state.update((n_docs, n_words, n_dups, list(seen)))
        state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {"source": [source], "n_docs": [n_docs],
             "n_words": [n_words], "n_dups": [n_dups]}
        )

    return (
        docs_with_ts.groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_dedup_exact(
    docs_with_ts: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup: fingerprint + dropDuplicatesWithinWatermark —
    state size bounded by the watermark horizon (at 10^12-doc scale the
    batch LSH pass handles history; the stream handles the live window)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = docs_with_ts.withColumn("fingerprint", F.xxhash64(norm))
    return fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
