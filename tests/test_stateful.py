"""applyInPandasWithState custom stateful operator test.

Two parquet files + maxFilesPerTrigger=1 → two micro-batches through one
query; group state (running totals + fingerprint set) must carry across
the batch boundary, so the duplicate in file 2 of a document from file 1
is detected."""

import datetime

from sparkhtml.spark.streaming import stateful_source_stats

BASE = datetime.datetime(2026, 1, 1)


def test_stateful_source_stats_across_microbatches(spark, tmp_path):
    # state-store instances = shuffle partitions per stateful operator per
    # micro-batch; 1 partition keeps this test fast (it's a semantics test,
    # not a scale test)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        _run(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run(spark, tmp_path):
    src = str(tmp_path / "in")
    batch1 = [
        (BASE, "srcA", 1, "alpha beta"),
        (BASE, "srcA", 2, "alpha  BETA"),  # dup within batch 1
        (BASE, "srcA", 3, "gamma delta eps"),
        (BASE, "srcB", 4, "zeta"),
    ]
    batch2 = [
        (BASE, "srcA", 5, "gamma delta eps"),  # dup ACROSS batches
        (BASE, "srcB", 6, "eta theta"),
    ]
    cols = ["ts", "source", "doc_id", "text"]
    spark.createDataFrame(batch1, cols).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, cols).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "ts timestamp, source string, doc_id long, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_source_stats(stream)
        .writeStream.format("memory")
        .queryName("srcstats")
        .outputMode("update")
        .start()
    )
    # with ProcessingTimeTimeout configured the query keeps scheduling
    # no-data batches to service timeouts and never self-terminates —
    # poll the sink for the expected emissions, then stop explicitly
    import time

    deadline = time.time() + 240
    while time.time() < deadline:
        n = spark.sql(
            "select count(*) from srcstats where source = 'srcA'"
        ).first()[0]
        if n >= 2:
            break
        time.sleep(2)
    q.stop()
    rows = spark.sql(
        "select * from srcstats order by source, n_docs"
    ).collect()
    # update mode: one row per (source, micro-batch); the LAST row per
    # source holds the final running totals
    final = {}
    for r in rows:
        final[r.source] = (r.n_docs, r.n_words, r.n_dups)
    # file order across micro-batches isn't guaranteed, but totals are
    # order-independent: srcA sees 4 docs / 10 words / 2 dups either way
    assert final["srcA"] == (4, 10, 2), final
    assert final["srcB"] == (2, 3, 0), final
    # state carried across batches: srcA appears in ≥2 micro-batch emissions
    assert sum(1 for r in rows if r.source == "srcA") >= 2
