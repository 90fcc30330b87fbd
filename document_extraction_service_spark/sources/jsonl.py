"""JSONL pages source — the other common crawl-dump interchange format
(one JSON object per line; html carried BASE64 because JSON cannot hold
bytes).

Spark-first shape: `spark.read.schema(...).json(glob)` — the native
JSON reader is line-splittable, so unlike WARC (record framing forces
one task per file) a single huge JSONL file parallelizes across tasks
for free, and the fixed schema skips the inference pass.  Decoding is
one codegen'd `unbase64` — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import PAGES_SCHEMA

JSONL_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html_b64", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    """JSONL glob -> PAGES_SCHEMA DataFrame (html = unbase64(html_b64);
    rows with undecodable/missing html keep html NULL — the extraction
    chain already handles NULL html as a failed page, not a crash)."""
    raw = spark.read.schema(JSONL_WIRE_SCHEMA).json(path)
    out = raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )
    # exact output contract: same columns, same nullability intent
    assert [f.name for f in PAGES_SCHEMA.fields] == out.columns
    return out
