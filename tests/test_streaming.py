"""Structured Streaming tests: file-stream extraction with AvailableNow,
windowed watermark aggregation, streaming exact dedup."""

import datetime

import pytest
from pyspark.sql import functions as F

from datagen.interleaved import make_corpus
from sparkhtml.spark import schemas


def test_stream_extract_available_now(spark, tmp_path):
    from sparkhtml.spark.pipeline import extract_spans_df
    from sparkhtml.spark.streaming import stream_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        list(make_corpus(40)), schema=schemas.DOCUMENTS_INTERLEAVED
    )
    docs.write.mode("overwrite").parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == 40
    # restart with no new files → exactly-once: nothing re-emitted
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 40
    # batch and stream agree
    batch = extract_spans_df(docs)
    assert got.count() == batch.count()
    g = {r["doc_id"]: r["spans"] for r in got.collect()}
    for r in batch.collect():
        assert g[r["doc_id"]] == r["spans"]


def test_stream_windowed_metrics(spark, tmp_path):
    from sparkhtml.spark.streaming import stream_quality_metrics

    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(seconds=30 * i), f"d{i}", 10 + i)
        for i in range(8)
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, ["ts", "doc_id", "n_words"]).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, doc_id string, n_words long")
        .parquet(src)
    )
    agg = stream_quality_metrics(stream, window="1 minute", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("winmetrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.window_start: (r.n_docs, r.n_words)
        for r in spark.sql("select * from winmetrics").collect()
    }
    # 8 events, 2 per minute window → 4 windows; append mode finalizes
    # only windows whose end <= watermark (= max ts, 3:30), so the last
    # window [3:00,4:00) stays in state: exactly 3 emitted
    assert len(got) == 3
    assert all(n == 2 for n, _ in got.values())


def test_stream_dedup_exact(spark, tmp_path):
    from sparkhtml.spark.streaming import stream_dedup_exact

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (base, 1, "same text"),
        (base + datetime.timedelta(seconds=10), 2, "same  TEXT"),
        (base + datetime.timedelta(seconds=20), 3, "unique content"),
    ]
    src = str(tmp_path / "dd")
    spark.createDataFrame(rows, ["ts", "doc_id", "text"]).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, doc_id long, text string")
        .parquet(src)
    )
    dd = stream_dedup_exact(stream)
    q = (
        dd.writeStream.format("memory")
        .queryName("dedupe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    kept = sorted(
        r.doc_id for r in spark.sql("select doc_id from dedupe").collect()
    )
    assert len(kept) == 2 and 3 in kept


def test_stream_text_cleanup_matches_batch(spark, tmp_path):
    """text_cleanup is stateless column algebra: identical on a
    readStream and on the batch frame."""
    from sparkhtml.spark.textstats import text_cleanup

    in_dir = str(tmp_path / "tc_in")
    out_dir = str(tmp_path / "tc_out")
    ckpt = str(tmp_path / "tc_ckpt")
    rows = [
        ("a", "plain text"),
        ("b", "a\x07b\u200bc  d"),
        ("c", "caf\u00c3\u00a9 mojibake"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema("doc_id string, text string").parquet(in_dir)
    q = (
        text_cleanup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    batch = {r.doc_id: r for r in text_cleanup(df).collect()}
    assert set(got) == set(batch)
    for k in batch:
        assert got[k].clean_text == batch[k].clean_text
        assert got[k].n_ctrl == batch[k].n_ctrl
        assert got[k].n_mojibake == batch[k].n_mojibake


def test_stream_pii_scrub_matches_batch(spark, tmp_path):
    """scrub_pii is stateless column algebra, so it applies unchanged to a
    readStream and must agree with the batch result exactly."""
    from sparkhtml.spark.scrub import scrub_pii

    in_dir = str(tmp_path / "pii_in")
    out_dir = str(tmp_path / "pii_out")
    ckpt = str(tmp_path / "pii_ckpt")
    rows = [
        ("a", "reach me at first.last@mail.example.org now"),
        ("b", "call +1-555-0101 then +1-555-0102"),
        ("c", "nothing sensitive in this one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema("doc_id string, text string").parquet(in_dir)
    q = (
        scrub_pii(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    batch = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert set(got) == set(batch)
    for k in batch:
        assert got[k].text_scrubbed == batch[k].text_scrubbed
        assert got[k].n_emails == batch[k].n_emails
        assert got[k].n_phones == batch[k].n_phones
    assert "[EMAIL]" in got["a"].text_scrubbed
    assert got["b"].n_phones == 2
