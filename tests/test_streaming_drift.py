"""Streaming corpus-drift monitor: stream == batch arithmetic, crafted
distribution extremes, and replay idempotence."""

import pandas as pd
from pyspark.sql import functions as F

from document_extraction_service_spark.streaming.drift import (
    DRIFT_SCALE,
    OTHER,
    build_drift_reference,
    drift_of_batch,
    process_drift_batch,
    stream_drift_monitor,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs_df(spark, texts, start_id=0):
    rows = pd.DataFrame(
        {
            "doc_id": [start_id + i for i in range(len(texts))],
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    return spark.createDataFrame(rows)


def test_reference_sums_to_scale_and_has_other(spark):
    ref = build_drift_reference(
        spark.read.parquet(SF_DOCS)
    ).collect()
    toks = {r["tok"] for r in ref}
    assert OTHER in toks
    assert sum(r["p_ref"] for r in ref) == DRIFT_SCALE


def test_identical_batch_drifts_near_zero(spark):
    docs = spark.read.parquet(SF_DOCS)
    ref = build_drift_reference(docs)
    row = drift_of_batch(docs, ref).collect()[0]
    # same distribution: only fixed-point floor error remains
    assert row["tvd"] < DRIFT_SCALE // 1000


def test_all_novel_batch_drifts_to_full_scale(spark):
    docs = spark.read.parquet(SF_DOCS)
    ref = build_drift_reference(docs)
    novel = _docs_df(spark, ["qqxyz1 qqxyz2 qqxyz3"] * 5)
    row = drift_of_batch(novel, ref).collect()[0]
    # all batch mass lands on OTHER, whose reference mass is ~0
    assert row["top_tok"] == OTHER
    assert row["tvd"] > DRIFT_SCALE * 9 // 10


def test_stream_equals_batch_per_micro_batch(spark, tmp_path):
    docs = spark.read.parquet(SF_DOCS)
    ref_path = str(tmp_path / "ref")
    build_drift_reference(docs).write.parquet(ref_path)
    ref = spark.read.parquet(ref_path)

    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = _docs_df(spark, ["novel1 novel2 novel3 novel4"] * 10, 10_000)

    in_dir = str(tmp_path / "in")
    b0.coalesce(1).write.mode("append").parquet(in_dir)
    b1.coalesce(1).write.mode("append").parquet(in_dir)

    q = stream_drift_monitor(
        spark,
        in_dir,
        ref_path,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        availableNow=True,
    )
    q.awaitTermination(300)

    got = {
        r["tvd"] for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        drift_of_batch(b, ref).collect()[0]["tvd"] for b in (b0, b1)
    }
    assert got == want and len(got) == 2


def test_replayed_drift_batch_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(SF_DOCS)
    ref = build_drift_reference(docs)
    out = str(tmp_path / "out")
    batch = docs.filter(F.col("doc_id") < 50)
    process_drift_batch(batch, 7, ref, out)
    first = spark.read.parquet(out).collect()
    process_drift_batch(batch, 7, ref, out)  # replay
    second = spark.read.parquet(out).collect()
    assert len(first) == len(second) == 1
    assert first[0].asDict() == second[0].asDict()
