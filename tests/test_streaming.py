"""Streaming smoke: the batch UDF chain runs unchanged under
Structured Streaming and produces the same rows as the batch path."""

import os

from document_extraction_service_spark import fixtures as fx
from document_extraction_service_spark.streaming import stream_extraction


def test_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    fx.write_parquet(str(src / "part-0.parquet"), 40)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extraction(spark, str(src), out, ckpt, availableNow=True)
    q.awaitTermination(120)

    got = {
        r["url"]: r["extraction"]["extracted_text"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 40
    from document_extraction_service_spark.extract.pipeline import extract_document

    for i in range(40):
        row = fx.gen_page(i)
        want = extract_document(row["html"], row["url"], row["lang"])
        assert got[row["url"]] == want["extraction"]["extracted_text"]
