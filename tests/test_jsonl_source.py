"""JSONL pages source: byte-identical extraction vs the fixture path,
and first-class `jsonl:<glob>` job input."""

import base64
import json

from pyspark.sql import functions as F

from document_extraction_service_spark import fixtures
from document_extraction_service_spark.sources.jsonl import read_jsonl_pages

N_PAGES = 20


def _write_jsonl(path: str, n: int) -> None:
    with open(path, "w") as f:
        for i in range(n):
            p = fixtures.gen_page(i)
            f.write(json.dumps({
                "url": p["url"],
                "warc_ts": "2024-05-01T12:00:00.000Z",
                "html_b64": base64.b64encode(p["html"]).decode("ascii"),
                "text": None,
                "lang": p["lang"],
            }) + "\n")


def test_jsonl_path_equals_fixture_path(spark, tmp_path):
    from document_extraction_service_spark.udfs import with_extraction

    path = str(tmp_path / "pages-000.jsonl")
    _write_jsonl(path, N_PAGES)
    proj = lambda df: {
        r["url"]: (r["extracted_text"], r["ok"])
        for r in with_extraction(df)
        .select(
            "url",
            F.col("extraction.extracted_text").alias("extracted_text"),
            F.col("status.ok").alias("ok"),
        )
        .collect()
    }
    via_jsonl = proj(read_jsonl_pages(spark, path))
    via_df = proj(fixtures.pages_df(spark, N_PAGES))
    assert via_jsonl == via_df and len(via_jsonl) == N_PAGES


def test_jsonl_null_and_bad_b64_yield_null_html(spark, tmp_path):
    path = str(tmp_path / "bad.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"url": "https://x.test/null", "html_b64": None}) + "\n")
    rows = read_jsonl_pages(spark, path).collect()
    assert len(rows) == 1 and rows[0]["html"] is None


def test_jsonl_job_input_end_to_end(spark, tmp_path):
    from document_extraction_service_spark.job import run_job

    path = str(tmp_path / "pages-000.jsonl")
    _write_jsonl(path, N_PAGES)
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    m = run_job(spark, f"jsonl:{path}", out, lin, run_id="j1", n_buckets=8)
    assert m["n_rows"] == N_PAGES and m["n_ok"] == N_PAGES
    m2 = run_job(spark, f"jsonl:{path}", out, lin, run_id="j1",
                 n_buckets=8, resume=True)
    assert m2["n_rows"] == 0
