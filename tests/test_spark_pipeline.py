"""Spark-layer tests (SURVEY §5.2 items 3-4): the DataFrame plumbing
adds nothing to the pure-Python engine, and results are byte-identical
regardless of partitioning."""

import json

import pytest
from pyspark.sql import functions as F

from document_extraction_service_spark import fixtures as fx
from document_extraction_service_spark.extract.pipeline import extract_document
from document_extraction_service_spark.fixtures import pages_df
from document_extraction_service_spark.udfs import with_extraction

N = 120


@pytest.fixture(scope="module")
def extracted_rows(spark):
    df = with_extraction(pages_df(spark, N, partitions=4))
    return {r["url"]: r for r in df.collect()}


def test_row_count_and_schema(extracted_rows, spark):
    assert len(extracted_rows) == N
    df = with_extraction(pages_df(spark, 5, partitions=1))
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "extraction", "status"]


def test_spark_equals_pure_python(extracted_rows):
    """Row-for-row: Spark UDF output == direct call of the same function."""
    for i in range(N):
        row = fx.gen_page(i)
        want = extract_document(row["html"], row["url"], row["lang"])
        got = extracted_rows[row["url"]]
        assert got["extraction"]["extracted_text"] == want["extraction"]["extracted_text"]
        assert got["status"]["ok"] == want["status"]["ok"]
        assert got["status"]["n_tables"] == want["status"]["n_tables"]
        assert got["status"]["n_images"] == want["status"]["n_images"]
        # deep compare via JSON round-trip (Row -> dict)
        assert json.loads(json.dumps(got["extraction"].asDict(recursive=True))) == json.loads(
            json.dumps(want["extraction"], ensure_ascii=False)
        )


def test_determinism_across_partitioning(spark):
    """Same input at different partition counts -> byte-identical
    extraction per url (SURVEY §5.2 item 4)."""
    a = with_extraction(pages_df(spark, 60, partitions=2))
    b = with_extraction(pages_df(spark, 60, partitions=7).repartition(13, F.xxhash64("url")))
    da = {r["url"]: r["extraction"]["extracted_text"] for r in a.collect()}
    db = {r["url"]: r["extraction"]["extracted_text"] for r in b.collect()}
    assert da == db


def test_html_not_in_output_plan(spark):
    """The heavy html column must be consumed by the UDF stage and never
    reach the output schema (scale guard: no payload re-shuffle)."""
    df = with_extraction(pages_df(spark, 5, partitions=1))
    assert "html" not in df.columns


def test_error_rows_captured(spark):
    import pandas as pd

    from document_extraction_service_spark.schema import PAGES_SCHEMA

    pdf = pd.DataFrame(
        {
            "url": ["https://x/bad"],
            "warc_ts": [None],
            "html": [None],
            "text": [None],
            "lang": [None],
        }
    )
    df = with_extraction(spark.createDataFrame(pdf, schema=PAGES_SCHEMA))
    r = df.collect()[0]
    assert r["status"]["ok"] is True  # None html -> empty page, still ok
    assert r["extraction"]["extracted_text"] == ""
