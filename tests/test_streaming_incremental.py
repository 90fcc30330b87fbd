"""Streaming incremental near-dup dedup == the batch operator, across
micro-batch boundaries (one dedup definition, batch and streaming)."""

from pyspark.sql import functions as F

from document_extraction_service_spark.operators.dedup import (
    incremental_near_dedup,
    minhash_band_index,
)
from document_extraction_service_spark.streaming.incremental_dedup import (
    process_dedup_batch,
    stream_incremental_dedup,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_stream_incremental_dedup_equals_batch(spark, tmp_path):
    docs = spark.read.parquet(SF_DOCS)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    idx = str(tmp_path / "index")
    minhash_band_index(existing).write.parquet(idx)
    ex = str(tmp_path / "existing")
    existing.write.parquet(ex)

    expected = {
        r["doc_id"]: (r["novel"], r["dup_of"])
        for r in incremental_near_dedup(
            batch, spark.read.parquet(idx), spark.read.parquet(ex)
        ).collect()
    }
    assert expected and any(not novel for novel, _ in expected.values())

    # two crawl drops -> two micro-batches (maxFilesPerTrigger=1)
    in_dir = str(tmp_path / "in")
    batch.filter(F.col("doc_id") % 20 == 0).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    batch.filter(F.col("doc_id") % 20 != 0).coalesce(1) \
        .write.mode("append").parquet(in_dir)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_incremental_dedup(
        spark, in_dir, idx, ex, out, ckpt,
        max_files_per_trigger=1, availableNow=True,
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(out).collect()
    got = {r["doc_id"]: (r["novel"], r["dup_of"]) for r in rows}
    assert got == expected
    # the stream really ran as multiple micro-batches
    assert len({r["batch_id"] for r in rows}) >= 2


def test_replayed_micro_batch_is_idempotent(spark, tmp_path):
    """A micro-batch replayed after a failure between sink write and
    checkpoint commit must OVERWRITE its own batch_id partition, not
    append a duplicate copy — and must not touch other batches."""
    docs = spark.read.parquet(SF_DOCS)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = minhash_band_index(existing)
    out = str(tmp_path / "out")

    b0 = batch.filter(F.col("doc_id") % 20 == 0)
    b1 = batch.filter(F.col("doc_id") % 20 != 0)
    process_dedup_batch(b0, 0, index, existing, out)
    process_dedup_batch(b1, 1, index, existing, out)
    before = sorted(
        (r["batch_id"], r["doc_id"], r["novel"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    )
    assert {b for b, *_ in before} == {0, 1}

    # crash-replay of batch 1: same rows, same batch_id
    process_dedup_batch(b1, 1, index, existing, out)
    after = sorted(
        (r["batch_id"], r["doc_id"], r["novel"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    )
    assert after == before  # no duplicates, batch 0 untouched
