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

Exactly-once: file source + foreachBatch writing (batch_id, doc_id,
novel, dup_of) PARTITIONED BY batch_id with per-write dynamic
partition overwrite — a micro-batch replayed after a failure between
the sink write and the checkpoint commit OVERWRITES its own
batch_id=N partition instead of appending a duplicate copy (the same
bucket-idempotence pattern job.py's sink uses), and the operator
itself is deterministic, so the rewritten partition is byte-identical.

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


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index: DataFrame,
    existing: DataFrame,
    output_dir: str,
) -> None:
    """One micro-batch through the batch dedup operator, written
    replay-idempotently: the output is partitioned by batch_id and
    written with per-write dynamic partition overwrite (CLAUDE.md
    gotcha #5), so a replayed micro-batch rewrites ONLY its own
    batch_id=N partition — append would duplicate it, static
    overwrite would delete every other batch's committed output.
    Module-level (not a closure) so the replay test can call it twice
    with the same batch_id and assert the row count is unchanged."""
    from ..operators.dedup import incremental_near_dedup

    if batch_df.isEmpty():
        return
    (
        incremental_near_dedup(batch_df, index, existing)
        .withColumn("batch_id", F.lit(batch_id))
        .select("doc_id", "novel", "dup_of", "batch_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
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
    Output rows: (batch_id, doc_id, novel, dup_of) written to
    `output_dir` partitioned by batch_id (replay-idempotent: see
    module docstring)."""
    index = spark.read.parquet(index_path)
    existing = spark.read.parquet(existing_path)

    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(batch_df, batch_id, index, existing, output_dir)

    writer = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()
