"""Shared parquet table reader for the operator modules — with a
scan-width guard for parallelism-starved inputs (guide §2.5 "input
skew: one huge unsplittable file … repartition immediately after the
read").

Why it exists (r7): a parquet table written as ONE small file (or one
row group) yields ONE scan partition no matter the session width —
`spark.sql.files.openCostInBytes` floors the split size at 4 MB, and
row groups cannot split below their boundaries — so EVERY map-side
computation before the first exchange (shingle-array builds, cosine
folds, regex scoring, the extraction UDF itself) runs on a single
task.  Measured at sf0.1/local[32]: the documents and embeddings
tables are single-row-group files, and widening the scan cut
dedup_ngram_jaccard 2.30 → 1.56 s, extract_documents 1.55 → 1.03 s,
curate_gopher_rules 0.64 → 0.45 s (same-session interleaved medians,
rows identical).

Scale safety: the repartition fires ONLY when the scan yields fewer
partitions than the session width.  For splittable columnar sources a
split is capped at `spark.sql.files.maxPartitionBytes`, so
`n_parts < width` bounds the table at width × maxPartitionBytes
(~1 GB at 32 cores with the session's 32 MB splits) — the widening
shuffle is small by construction exactly when it is needed, and a
production-scale corpus scan (thousands of splits ≥ width) passes
through untouched, preserving the map-only no-payload-shuffle shape
the operators are designed around.  The round-robin repartition is
retry-deterministic (Spark sorts before round-robin partitioning,
SPARK-23207) and no operator output depends on input partitioning
(float aggregates go through DECIMAL / fixed-point sums, collected
arrays are array_sort'ed or feed set-semantics explodes, top-k
windows carry total orders — the package determinism contract).

The partition probe (`df.rdd.getNumPartitions()`) is job-free: the
plan and file listing already exist after `spark.read.parquet`
(which itself runs one schema-inference job on this version,
CLAUDE.md #21 — unchanged by this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin a parallelism-starved scan across the session
    width; identity when the scan is already at least session-wide
    (the production case).  See the module docstring for the scale
    argument."""
    width = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width * 2)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return widen_narrow_scan(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
