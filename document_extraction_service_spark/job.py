"""Batch extraction job: read -> repartition by url-hash -> extract ->
write, with per-bucket lineage and resume.

Spark lifecycle per SURVEY §3.4:

    spark-submit --py-files engine.zip -m document_extraction_service_spark.job \\
        --input <pages parquet | synthetic:N> --output <dir> --lineage <dir> \\
        --run-id r1 [--n-buckets 128] [--resume]

Scale design (north_rule requirements, mapped):
  * explicit url-hash partitioning: bucket = pmod(xxhash64(url), B);
    repartition on bucket before the UDF chain
  * skew: url-hash buckets are row-count-uniform even under host skew
    (urls are unique), so the map stage has no key skew; *work* skew
    from giant pages is bounded by small Arrow batches + B >> cores so
    stragglers overlap.  Host-keyed aggregations (where host skew does
    bite) use the salted two-phase pattern in operators/relational.py.
  * resumable checkpoints: each bucket is an atomic unit — dynamic
    partition overwrite makes task replays idempotent per bucket; the
    lineage table records (run_id, bucket, input_fingerprint, n_ok,
    n_failed); --resume anti-joins finished buckets for the same input
    fingerprint (SURVEY §4.4, Iceberg-snapshot semantics on a parquet
    fallback — this container ships no Iceberg runtime jars).  The
    REAL Iceberg path (writeTo create/overwritePartitions/append,
    snapshot-id fingerprints, snapshot-checkpoint resume) is
    iceberg_sink.run_job_iceberg, exercised end-to-end by
    tests/test_iceberg.py whenever SPARK_GRAFT_ICEBERG_JARS is set.
  * metrics: n_ok/n_failed derived from the lineage aggregation over
    the committed output (a column-pruned scan; .observe() was measured
    2x slower on the write stage and removed).
"""

from __future__ import annotations

import argparse
import datetime as _dt
import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import PAGES_SCHEMA, bucketed_pages_schema
from .udfs import extraction_col

DEFAULT_BUCKETS = 128

# Parquet writer options for the output table, A/B-tuned at local[32]
# with scripts/write_ab.py (VERDICT r2 next-round #1: the nested-struct
# encode was the 32-wide limiter).  Findings (48k pages, interleaved
# reps, medians): dictionary encoding OFF saves encode CPU at ZERO size
# cost — extracted text/sentences/urls are near-unique, so parquet
# builds dictionaries that always fall back; zstd beats snappy on both
# write time (~5%) and bytes (-25%), which at 100 TB is a quarter of
# the output IO.  Row-group size was a wash at this file size; JSON
# pre-serialization of the struct was ~8% faster but breaks the typed
# struct-per-url output contract (north_star) — rejected.  Overridable
# per-run via SPARK_GRAFT_WRITE_OPTS="k=v,k=v" for benchmarking.
DEFAULT_WRITE_OPTS: dict[str, str] = {
    "compression": "zstd",
    "parquet.enable.dictionary": "false",
}


def write_options() -> dict[str, str]:
    env = os.environ.get("SPARK_GRAFT_WRITE_OPTS", "")
    if not env:
        return dict(DEFAULT_WRITE_OPTS)
    out = dict(DEFAULT_WRITE_OPTS)
    for item in env.split(","):
        if "=" in item:
            k, _, v = item.partition("=")
            out[k.strip()] = v.strip()
    return out


def input_fingerprint(spec: str, n_buckets: int = DEFAULT_BUCKETS) -> str:
    """Stable identity of the (input snapshot, bucketing) pair (SURVEY
    §4.4: Iceberg snapshot id; parquet fallback: recursive file
    listing).  n_buckets is folded in because bucket ids are only
    comparable under the same modulus — resuming a B=128 lineage row
    into a B=64 run would silently skip wrong buckets.  Data files are
    hashed by relative path + size + mtime: regenerating input in
    place changes the fingerprint even at identical sizes (fails to
    the safe side: work is redone, never wrongly skipped)."""
    h = hashlib.md5(f"{spec}|B={n_buckets}".encode())
    if spec.startswith("synthetic:"):
        return h.hexdigest()
    if spec.startswith(("warc:", "jsonl:", "wet:", "wds:")):
        # fingerprint the files the glob resolves to (sorted -> stable)
        import glob as _glob

        for p in sorted(_glob.glob(spec.split(":", 1)[1])):
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
        return h.hexdigest()
    if os.path.isdir(spec):
        for root, dirs, files in os.walk(spec):
            dirs.sort()
            rel = os.path.relpath(root, spec)
            for name in sorted(files):
                p = os.path.join(root, name)
                st = os.stat(p)
                h.update(f"{rel}/{name}|{st.st_size}|{st.st_mtime_ns}".encode())
    elif os.path.isfile(spec):
        st = os.stat(spec)
        h.update(f"{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def is_bucketed_input(spec: str) -> bool:
    """True when the input is already laid out as bucket=NN partition
    dirs (the parquet stand-in for an Iceberg `bucket(N, url)` partition
    transform).  Such input needs NO shuffle: the extraction job is
    map-only, which is the 10^12-row design point — never move raw
    payloads across the cluster."""
    return os.path.isdir(spec) and any(
        name.startswith("bucket=") for name in os.listdir(spec)
    )


def read_pages(spark: SparkSession, spec: str, partitions: int | None = None) -> DataFrame:
    """`synthetic:N` -> distributed fixture generation; `warc:<glob>`
    -> crawl-native WARC files (sources/warc.py, one task per file);
    else parquet path (swap point for `spark.read.format("iceberg")`)."""
    if spec.startswith("synthetic:"):
        from .fixtures import pages_df

        n = int(spec.split(":", 1)[1])
        return pages_df(spark, n, partitions=partitions)
    if spec.startswith("warc:"):
        from .sources.warc import read_warc

        return read_warc(spark, spec.split(":", 1)[1])
    if spec.startswith("jsonl:"):
        from .sources.jsonl import read_jsonl_pages

        return read_jsonl_pages(spark, spec.split(":", 1)[1])
    if spec.startswith("wet:"):
        # WET carries extracted text only (no html): rows enter the job
        # as null-html pages and ride the text-fallback extraction path
        # (status.fallback=true), re-entering curation downstream — the
        # re-curate-an-existing-corpus loop, now a first-class input.
        from .sources.warc import read_wet

        return read_wet(spark, spec.split(":", 1)[1]).select(
            "url",
            "warc_ts",
            F.lit(None).cast("binary").alias("html"),
            "text",
            F.lit(None).cast("string").alias("lang"),
        )
    if spec.startswith("wds:"):
        # WebDataset tar shards carry extracted text (a training
        # export): rows re-enter as null-html pages on the same
        # text-fallback path as wet: — export -> re-ingest closes
        # through the job CLI for BOTH crawl-native formats.
        from .sources.webdataset import read_webdataset

        d = read_webdataset(spark, spec.split(":", 1)[1])
        return d.select(
            F.concat(
                F.lit("wds://"),
                F.coalesce(F.col("source"), F.lit("shard")),
                F.lit("/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
    if is_bucketed_input(spec):
        return spark.read.schema(bucketed_pages_schema()).parquet(spec)
    return spark.read.schema(PAGES_SCHEMA).parquet(spec)


def finished_buckets(spark: SparkSession, lineage_path: str, fingerprint: str) -> list[int]:
    if not os.path.isdir(lineage_path) or not os.listdir(lineage_path):
        return []
    lin = spark.read.parquet(lineage_path)
    rows = (
        lin.filter(F.col("input_fingerprint") == fingerprint)
        .select("bucket")
        .distinct()
        .collect()  # bucket set is tiny (<= n_buckets), driver-safe
    )
    return [r["bucket"] for r in rows]


def run_job(
    spark: SparkSession,
    input_spec: str,
    output_path: str,
    lineage_path: str,
    run_id: str,
    n_buckets: int = DEFAULT_BUCKETS,
    resume: bool = False,
    only_buckets: list[int] | None = None,
    n_partitions: int | None = None,
    wet_path: str | None = None,
) -> dict:
    """Returns job metrics dict. Idempotent per (input, bucket)."""
    t0 = time.time()
    fp = input_fingerprint(input_spec, n_buckets)
    bucketed = is_bucketed_input(input_spec)
    pages = read_pages(spark, input_spec)
    if not bucketed:
        pages = pages.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )

    skip: set[int] = set(finished_buckets(spark, lineage_path, fp)) if resume else set()
    if only_buckets is not None:
        pages = pages.filter(F.col("bucket").isin([int(b) for b in only_buckets]))
    if skip:
        # bucket list is small: broadcast-friendly isin, no shuffle
        pages = pages.filter(~F.col("bucket").isin(sorted(skip)))

    if not bucketed:
        # explicit url-hash repartitioning before the UDF chain, ALIGNED
        # with the bucket column: with n_partitions == n_buckets each task
        # holds whole buckets, so the partitionBy("bucket") write emits ~1
        # file per bucket instead of tasks x buckets small files (measured
        # 2x job throughput at 60k rows).  Buckets >> cores keeps
        # giant-page stragglers overlapped.
        n_parts = n_partitions or n_buckets
        pages = pages.repartition(n_parts, "bucket")
    # bucketed input: NO shuffle at all — scan tasks follow the bucket=NN
    # dir layout, so the whole job is map-only (scan -> UDF -> write);
    # at 10^12 rows this is the difference between moving 100 TB of
    # payload over the network and moving nothing.

    # NOTE: no .observe() here — CollectMetrics measured 2x slower on
    # this write at local[32] (90s vs 48s); all metrics come from the
    # lineage aggregation over the committed output instead (a
    # column-pruned second scan that reads only bucket + status).
    extracted = (
        pages.select("url", "warc_ts", "html", "lang", "text", "bucket")
        .withColumn("_res", extraction_col())
        .select(
            "url",
            "warc_ts",
            "bucket",
            # snapshot identity embedded per row (constant -> RLE'd to
            # ~nothing in parquet): the lineage scan below and any
            # later audit can scope to THIS input without trusting the
            # directory state (stale buckets from an older input are
            # excluded by construction, not by set arithmetic)
            F.lit(fp).alias("input_fp"),
            F.col("_res.extraction").alias("extraction"),
            F.col("_res.status").alias("status"),
        )
    )

    t_plan = time.time()
    writer = (
        extracted.write.mode("overwrite")
        # per-write (not session-conf) so bucket-level idempotence holds
        # under any session: replays overwrite only the buckets they carry
        .option("partitionOverwriteMode", "dynamic")
    )
    for k, v in write_options().items():
        writer = writer.option(k, v)
    writer.partitionBy("bucket").parquet(output_path)
    t_written = time.time()
    wall_ms = int((time.time() - t0) * 1000)

    # per-bucket lineage from the committed output (column-pruned scan:
    # reads only bucket + input_fp + status.ok, never the extraction
    # payload).  Scoped to THIS input via the embedded input_fp —
    # bucket partitions left over from an older input (dynamic
    # overwrite never touches buckets absent from the current input)
    # are excluded — and to this run's buckets via skip/only.  The
    # output schema is the one this function just wrote, so it is
    # passed explicitly: a bare spark.read.parquet runs one
    # schema-inference job over the footers first (CLAUDE.md gotcha
    # #21) — pure overhead on the job's own table.
    out = spark.read.schema(extracted.schema).parquet(output_path).filter(
        F.col("input_fp") == fp
    )
    if skip:
        out = out.filter(~F.col("bucket").isin(sorted(skip)))
    if only_buckets is not None:
        out = out.filter(F.col("bucket").isin([int(b) for b in only_buckets]))
    if wet_path:
        # optional WET twin of the parquet sink: ok pages only, from the
        # COMMITTED output (column-pruned scan — url/bucket/text), so the
        # WET files mirror exactly what the parquet sink committed;
        # bucket-dynamic overwrite keeps resume semantics (sources/warc.py)
        from .sources.warc import write_wet

        write_wet(
            out.filter(F.col("status.ok")).select(
                "url",
                F.col("extraction.extracted_text").alias("extracted_text"),
                "bucket",
            ),
            wet_path,
        )

    lineage = (
        out.groupBy("bucket")
        .agg(
            F.sum(F.col("status.ok").cast("long")).alias("n_ok"),
            F.sum((~F.col("status.ok")).cast("long")).alias("n_failed"),
            F.sum(F.col("status.truncated").cast("long")).alias("n_truncated"),
            F.sum(F.col("status.fallback").cast("long")).alias("n_fallback"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("input_fingerprint", F.lit(fp))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn("committed_at", F.lit(_dt.datetime.now(_dt.timezone.utc)))
        .select(
            "run_id", "bucket", "input_fingerprint",
            "n_ok", "n_failed", "n_truncated", "n_fallback",
            "wall_ms", "committed_at",
        )
    )
    # the lineage table is <= n_buckets rows by construction: collect
    # it ONCE (driver-safe, the finished_buckets contract), total it in
    # Python, and write the collected rows back — one pass over the
    # committed output instead of two (the previous cache + agg +
    # cached write ran the totals aggregation as its own job)
    lineage_rows = lineage.collect()
    spark.createDataFrame(lineage_rows, lineage.schema).write.mode(
        "append"
    ).parquet(lineage_path)
    lineage_ms = int((time.time() - t_written) * 1000)

    n_rows = sum(r["n_ok"] + r["n_failed"] for r in lineage_rows)
    return {
        "run_id": run_id,
        "input_fingerprint": fp,
        "n_rows": n_rows,
        "n_ok": sum(r["n_ok"] for r in lineage_rows),
        "n_truncated": sum(r["n_truncated"] for r in lineage_rows),
        "n_fallback": sum(r["n_fallback"] for r in lineage_rows),
        "wall_ms": wall_ms,
        "plan_ms": int((t_plan - t0) * 1000),
        "write_ms": int((t_written - t_plan) * 1000),
        "lineage_ms": lineage_ms,
        "docs_per_sec": n_rows / max(wall_ms / 1000.0, 1e-9),
        "skipped_buckets": sorted(skip),
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet path or synthetic:N")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--n-buckets", type=int, default=DEFAULT_BUCKETS)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--wet", default=None,
                    help="also write ok pages as WET conversion records here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .session import build_session

    spark = build_session(master=args.master, app_name=f"extract-{args.run_id}")
    try:
        metrics = run_job(
            spark,
            args.input,
            args.output,
            args.lineage,
            args.run_id,
            n_buckets=args.n_buckets,
            resume=args.resume,
            wet_path=args.wet,
        )
        print(metrics)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
