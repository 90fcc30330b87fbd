"""Streaming incremental NEAR-dup dedup: each micro-batch of newly
crawled docs is deduplicated against the PERSISTED corpus LSH band
index with the exact same operator the daily batch job uses.

This is the production shape of continuous-crawl dedup: the stream IS
a sequence of "today's batches", so `foreachBatch` hands every
micro-batch to operators.dedup.incremental_near_dedup — one dedup
definition for batch and streaming (the gate_reason() composition
pattern from round 4, applied to dedup).  The index and corpus store
are STATIC sides read once per micro-batch and probed via
broadcast-the-batch joins, so nothing about the scale contract changes:
old rows are never re-sketched or re-shuffled, and shuffle volume per
micro-batch is proportional to that batch.

Exactly-once: file source + foreachBatch writing with batch-id-derived
idempotence (parquet append of (batch_id, doc_id, novel, dup_of) —
replayed micro-batches rewrite identical rows because the operator is
deterministic), checkpointed.

At 10^12-row scale the index would be an Iceberg table bucketed on
(band, bucket) maintained by a nightly compaction that folds the day's
novel docs in; the probe plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def stream_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    existing_path: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    availableNow: bool = False,
):
    """Start a stream deduplicating incoming doc files against the
    persisted band index at `index_path` (built by
    dedup.minhash_band_index over the corpus at `existing_path`).
    Output rows: (batch_id, doc_id, novel, dup_of) appended to
    `output_dir`."""
    from ..operators.dedup import incremental_near_dedup

    index = spark.read.parquet(index_path)
    existing = spark.read.parquet(existing_path)

    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            incremental_near_dedup(batch_df, index, existing)
            .withColumn("batch_id", F.lit(batch_id))
            .select("batch_id", "doc_id", "novel", "dup_of")
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()
