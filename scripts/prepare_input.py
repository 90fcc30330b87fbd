"""Materialize the synthetic pages corpus as a BUCKETED parquet table
(bucket=NN partition dirs), the parquet stand-in for an Iceberg table
with a `bucket(N, url)` partition transform.

    python scripts/prepare_input.py N OUT_DIR [n_buckets]

The extraction job detects the layout and runs map-only (no shuffle of
raw payloads) — the 10^12-row design point.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1])
    out = sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from pyspark.sql import functions as F

    from document_extraction_service_spark.fixtures import pages_df
    from document_extraction_service_spark.session import build_session

    spark = build_session(app_name="prepare_input")
    try:
        df = pages_df(spark, n).withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        (
            df.repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        print(f"wrote {n} pages to {out} ({n_buckets} buckets)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
