"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full extraction pipeline over pages synthesized
               (JVM-side) from the sf0.001 documents table.
queries()    — one entry per implemented operator family (SURVEY §2 and
               the training-data-pipeline ops); each takes (spark, sf_dir).
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query.
               xxhash64-based sketches (minhash/simhash/LSH planes) and
               the free-form fixture-corpus extraction are rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_extraction_service_spark.operators import ALL_ORACLES, ALL_QUERIES  # noqa: E402


def _doc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a pages table from the documents table with a fixed
    HTML template — entirely JVM-side column expressions (no Python),
    so the expected extraction is provable in SQL: the template yields
    exactly one chapter '1. Introduction' with one single-sentence
    paragraph `text || '.'`."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.encode(
        F.concat(
            F.lit('<html lang="'), F.coalesce(F.col("lang"), F.lit("en")),
            F.lit('"><head><title>Doc '), F.col("doc_id").cast("string"),
            F.lit("</title></head><body><h1>Doc "), F.col("doc_id").cast("string"),
            F.lit("</h1><h2>1. Introduction</h2><p>"), F.col("text"),
            F.lit(".</p></body></html>"),
        ),
        "utf-8",
    )
    return d.select(
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def q_extract_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end extraction with a SQL-provable invariant (the
    byte-identical-text contract, BASELINE.json north_rule)."""
    from document_extraction_service_spark.udfs import with_extraction

    out = with_extraction(_doc_pages(spark, sf_dir))
    return out.select(
        "url",
        F.col("extraction.extracted_text").alias("extracted_text"),
        F.col("extraction.metadata.title").alias("title"),
        F.col("status.ok").alias("ok"),
    )


SQL_EXTRACT_DOCUMENTS = r"""
SELECT 'synthetic://doc/' || CAST(doc_id AS VARCHAR) AS url,
       '1. Introduction' || chr(10) || text || '.' AS extracted_text,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       TRUE AS ok
FROM documents
"""


def q_extract_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fixture-family corpus (articles/boilerplate/tables/figures/
    metadata/edge) through the extraction chain — rows-only check; the
    byte-level gate for this path is tests/golden under pytest."""
    from document_extraction_service_spark.fixtures import pages_df
    from document_extraction_service_spark.udfs import with_extraction

    out = with_extraction(pages_df(spark, 500))
    return out.select(
        "url",
        F.col("status.ok").alias("ok"),
        F.col("status.n_tables").alias("n_tables"),
        F.col("status.n_images").alias("n_images"),
        F.length("extraction.extracted_text").alias("text_len"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "extract_documents": q_extract_documents,
        "extract_corpus": q_extract_corpus,
    }
    out.update(ALL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {"extract_documents": SQL_EXTRACT_DOCUMENTS}
    out.update(ALL_ORACLES)
    return out
