"""Composed streaming pipeline: crawl drop -> stateful cross-batch
dedup -> full extraction UDF chain -> parquet sink, in ONE streaming
query — the shape a continuously-ingesting 100 TB pipeline runs.  The
composed stream must equal the batch equivalent byte-for-byte on the
surviving rows."""

import datetime as dt
import os

from pyspark.sql import functions as F

from document_extraction_service_spark.schema import PAGES_SCHEMA
from document_extraction_service_spark.streaming.stateful_dedup import dedup_stream
from document_extraction_service_spark.udfs import with_extraction

TS = dt.datetime(2024, 1, 1)


def _rows(ids, salt=""):
    return [
        (f"https://h{i % 3}.example/p{i}", TS,
         (f"<html><head><title>Doc {i}</title></head><body><h1>Doc {i}</h1>"
          f"<h2>1. Intro</h2><p>Content {i}{salt} has enough words to "
          f"survive the density gate of the extractor.</p></body></html>"
          ).encode(),
         f"text {i}", "en")
        for i in ids
    ]


def test_dedup_then_extract_stream_equals_batch(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    # two drops in one availableNow run: 12 fresh + 6 exact re-crawls + 2 new
    spark.createDataFrame(_rows(range(12)), PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(_rows(range(6)) + _rows(range(12, 14)), PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    fresh = dedup_stream(stream, n_shards=4).drop("first_seen")
    q = (
        with_extraction(fresh)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    assert got.count() == 14  # each url exactly once despite re-crawls
    assert got.filter(F.col("status.ok")).count() == 14

    # batch equivalent over the deduped input -> identical extraction bytes
    batch = with_extraction(
        spark.createDataFrame(_rows(range(14)), PAGES_SCHEMA)
    ).select("url", F.col("extraction.extracted_text").alias("t"))
    stream_texts = {
        r["url"]: r["t"]
        for r in got.select(
            "url", F.col("extraction.extracted_text").alias("t")
        ).collect()
    }
    for r in batch.collect():
        assert stream_texts[r["url"]] == r["t"], r["url"]


def test_extract_then_quality_gate_stream_equals_batch(spark, tmp_path):
    """Extraction -> quality-gate filtering composed in ONE streaming
    query (both stateless maps): the gated stream output must equal
    the batch equivalent row-for-row, and the gate must actually drop
    the degenerate page."""
    from document_extraction_service_spark.operators.curation import gate_reason

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    # normal pages: >= GATE_MIN_WORDS distinct words with stopwords
    rows = [
        (f"https://h{i % 3}.example/q{i}", TS,
         (f"<html><body><h1>Doc {i}</h1><p>the study of item{i} covers "
          f"alpha{i} beta{i} gamma{i} delta{i} and epsilon{i} plus "
          f"zeta{i} eta{i} theta{i} iota{i} kappa{i} of note "
          f"here.</p></body></html>").encode(),
         f"text {i}", "en")
        for i in range(8)
    ]
    # a degenerate page: long same-word run in the only paragraph
    rows.append((
        "https://spam.example/p", TS,
        ("<html><body><h1>Spam</h1><p>" + "buy " * 40
         + "</p></body></html>").encode(),
        "spam", "en"))
    spark.createDataFrame(rows, PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    def gated(df):
        return (
            with_extraction(df)
            .select("url", F.col("extraction.extracted_text").alias("text"))
            .withColumn("fail_reason", gate_reason())
            .filter(F.col("fail_reason") == "ok")
            .select("url", "text", "fail_reason")
        )

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q = (
        gated(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    batch = {
        r["url"]: r["text"]
        for r in gated(spark.read.schema(PAGES_SCHEMA).parquet(src)).collect()
    }
    assert got == batch
    assert "https://spam.example/p" not in got  # degeneracy gate fired
    assert len(got) >= 6  # normal pages survive


def test_decontaminate_stream_static_join_equals_batch(spark, tmp_path):
    """Streaming decontamination = a STREAM-STATIC broadcast join: the
    benchmark gram set is a static table, arriving documents join it
    statelessly (append mode, no watermark, no state store).  The
    flagged (doc_id, gram) pairs must equal the batch run's."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_extraction_service_spark.operators.curation import (
        CONTAM_MOD,
        _contam_ngrams,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    docs = [
        (0, "p q r s t u"),            # benchmark doc (0 % CONTAM_MOD == 0)
        (5, "m n p q r s"),            # shares 'p q r s'
        (6, "a b c d e f"),            # clean
        (CONTAM_MOD, "v w x y z zz"),  # second benchmark doc
        (9, "k l v w x y"),            # shares 'v w x y'
    ]
    pq.write_table(
        pa.table({
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
        }),
        os.path.join(src, "part0.parquet"),
    )

    batch_docs = spark.read.parquet(src)
    bench = (
        batch_docs.filter(F.col("doc_id") % CONTAM_MOD == 0)
        .select(F.explode(_contam_ngrams()).alias("g")).distinct()
    )

    def flagged(df):
        return (
            df.filter(F.col("doc_id") % CONTAM_MOD != 0)
            .select("doc_id", F.explode(_contam_ngrams()).alias("g"))
            .join(F.broadcast(bench), "g")
        )

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    q = (
        flagged(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r["doc_id"], r["g"]) for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], r["g"]) for r in flagged(batch_docs).collect()}
    assert got == want
    assert (5, "p q r s") in got and (9, "v w x y") in got
    assert not any(d == 6 for d, _ in got)
