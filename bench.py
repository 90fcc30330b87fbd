"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is extraction throughput (docs/sec) over the
deterministic synthetic pages corpus (BASELINE.json metric), measured
on the full job path (generate -> repartition -> extract -> write).
Per-query wall seconds for the operator suite are reported under
"queries".  Scaling-efficiency evidence (local[8] vs local[32]) is
produced separately by scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "48000"))

# operator queries timed at sf_dir (a representative cross-section:
# heavy shuffle agg, window, joins, dedup sketches, ANN, text stats)
BENCH_QUERIES = [
    "extract_documents",
    "rel_pricing_summary",
    "rel_sessionize",
    "rel_range_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_pipeline",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "ann_ivf",
    "curate_corpus",
    "text_langid",
    "text_fingerprint",
    "text_top_ngrams",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import __spark_entry__ as entry
    from document_extraction_service_spark.job import run_job
    from document_extraction_service_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]", app_name="bench")

    queries: dict[str, float] = {}

    # headline: extraction job throughput over the synthetic pages corpus,
    # read from a bucketed table (the map-only scale shape; input
    # materialization is untimed).  Two runs, best-of: this host shows
    # bursty hypervisor steal, and noise only ever subtracts.
    with tempfile.TemporaryDirectory() as tmp:
        from pyspark.sql import functions as F

        from document_extraction_service_spark.fixtures import pages_df

        inp = os.path.join(tmp, "pages")
        (
            pages_df(spark, BENCH_PAGES)
            .withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(128)).cast("int"))
            .repartition(128, "bucket")
            .write.partitionBy("bucket")
            .parquet(inp)
        )
        # 3 trials, MEDIAN docs/sec: best-of-2 hides warm-up asymmetry
        # and this host's steal bursts swing single runs 2x (CLAUDE.md
        # gotcha #1) — the median is the round-over-round comparable.
        trials = []
        for trial in range(3):
            t0 = time.time()
            m = run_job(
                spark,
                inp,
                os.path.join(tmp, f"out{trial}"),
                os.path.join(tmp, f"lineage{trial}"),
                f"bench{trial}",
            )
            queries[f"extract_job_t{trial}"] = round(time.time() - t0, 3)
            trials.append(m)
        trials.sort(key=lambda m: m["docs_per_sec"])
        m = trials[len(trials) // 2]
    docs_per_sec = m["docs_per_sec"]

    qmap = entry.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        # noop sink forces FULL materialization of every output column —
        # count() lets Catalyst prune projected columns, so select-only
        # queries (text_*, extract_documents) would skip the measured
        # md5/regex/UDF work entirely (CLAUDE.md gotcha #7)
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "extraction_docs_per_sec",
                "value": round(docs_per_sec, 2),
                "unit": "docs/sec",
                "total_sec": total,
                "queries": queries,
                "sf": sf_dir,
                "cpus": cpus,
                "bench_pages": BENCH_PAGES,
                "n_ok": m["n_ok"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
