"""Watermarked windowed streaming agg == batch agg for closed windows."""

import shutil

from pyspark.sql import functions as F

from document_extraction_service_spark.streaming.windowed import (
    EVENTS_SCHEMA,
    stream_windowed_counts,
)

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_windowed_counts_match_batch(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    shutil.copy(SF_EVENTS, str(tmp_path / "in" / "events.parquet"))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_windowed_counts(spark, src_dir, out, ckpt, availableNow=True)
    q.awaitTermination(180)

    streamed = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert streamed, "no windows emitted"

    # batch reference: only windows fully below (max_ts - watermark)
    # can have emitted in append mode
    e = spark.read.schema(EVENTS_SCHEMA).parquet(SF_EVENTS).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    batch = (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
                "event_type", "n", "s")
        .collect()
    )
    import datetime

    horizon = max_ts - datetime.timedelta(hours=1)
    for r in batch:
        key = (r["ws"], r["event_type"])
        if r["we"] <= horizon:
            assert key in streamed, f"closed window missing: {key}"
            assert streamed[key] == (r["n"], r["s"])
    # every streamed window must match batch exactly
    batch_map = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    for key, val in streamed.items():
        assert batch_map[key] == val
