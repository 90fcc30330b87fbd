"""Stateful cross-microbatch dedup (applyInPandasWithState): only
first-seen (url, content) rows pass; state survives query restarts via
the checkpoint."""

import datetime as dt
import os

from document_extraction_service_spark.schema import PAGES_SCHEMA
from document_extraction_service_spark.streaming.stateful_dedup import dedup_stream

TS = dt.datetime(2024, 1, 1)


def _rows(ids, salt=""):
    return [
        (f"https://h{i % 3}.example/p{i}", TS,
         f"<html><p>content {i}{salt} with enough words to matter</p></html>".encode(),
         f"text {i}", "en")
        for i in ids
    ]


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream, n_shards=8)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_dedup_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    spark.createDataFrame(_rows(range(20)), PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 20
    assert set(first.columns) == {"url", "warc_ts", "html", "text", "lang", "first_seen"}

    # second drop, NEW query run (state restored from checkpoint):
    # 10 exact duplicates, 10 new pages, 1 re-crawl with changed content
    batch2 = _rows(range(10)) + _rows(range(20, 30)) + _rows([10], salt=" v2")
    spark.createDataFrame(batch2, PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)

    got = spark.read.parquet(out).collect()
    urls = [r["url"] for r in got]
    assert len(got) == 20 + 10 + 1  # dups dropped, changed content re-emitted
    assert len([u for u in urls if u.endswith("/p10")]) == 2  # original + v2
    assert all(r["first_seen"] for r in got)


def test_stateful_dedup_within_one_batch_set(spark, tmp_path):
    """Duplicates split across microbatches of a single run (two files,
    maxFilesPerTrigger=1) are also collapsed."""
    src, out, ckpt = (str(tmp_path / d) for d in ("s2", "o2", "c2"))
    os.makedirs(src)
    spark.createDataFrame(_rows(range(8)), PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(_rows(range(8)), PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 8
