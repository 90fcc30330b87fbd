"""Streaming extraction: the batch UDF chain applied to a file-source
stream of pages parquet, with per-microbatch metrics.

Usage (continuous ingestion of crawl drops):

    q = stream_extraction(spark, input_dir, output_dir, checkpoint_dir)
    q.awaitTermination()

Exactly-once: file source + parquet sink + checkpointing give Spark's
standard end-to-end guarantee; the UDF chain is deterministic
(schema-declared, no RNG/time/network), so replayed microbatches
rewrite identical bytes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schema import PAGES_SCHEMA
from ..udfs import with_extraction


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    availableNow: bool = False,
):
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = with_extraction(src)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()
