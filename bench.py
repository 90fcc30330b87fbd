"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is extraction throughput (docs/sec) over the
deterministic synthetic pages corpus (BASELINE.json metric), measured
on the full job path (bucketed scan -> extract -> write) as the MEDIAN
of SPARK_GRAFT_BENCH_REPS (default 5) repetitions.

SELF-EVIDENCING (VERDICT r3 next-round #1): this VM is bimodal on a
~10-minute timescale and its slow mode scales with job width (CLAUDE.md
gotchas #1/#17: identical 150k-row local[32] runs measured 921 vs 5,390
docs/s ten minutes apart).  So every repetition carries its own host
evidence IN THE EMITTED JSON:

  * a memory-bandwidth probe (concurrent width-wide 128MB copies) run
    immediately BEFORE and immediately AFTER the rep — quiet host
    ~0.25s, degraded windows multiply it.  Bandwidth, not ALU: pure
    arithmetic scales perfectly even in degraded windows, so only a
    bandwidth probe sees the mode that slows a string/Arrow/parquet
    engine.  The AFTER probe matters because the mode can flip
    mid-run (r3 bench slow samples carried quiet BEFORE probes).
  * the /proc/stat CPU split (user/sys/iowait/steal/idle %) across the
    rep — distinguishes hypervisor steal from GC/sys pathology.

A slow rep with degraded probes is host weather; a slow rep with quiet
probes on both sides and low steal would be an engine regression.  The
headline median plus per-rep evidence makes the artifact judgeable on
its own.  Per-query wall seconds for the operator suite are reported
under "queries" (single pass, probes around the suite).
Scaling-efficiency evidence (local[2] vs local[8] vs local[32]) is
produced separately by scripts/scaling_bench.py -> BENCH/BASELINE.md.

TAIL-CAPTURE SAFETY (VERDICT r4 "What's wrong" #1): the driver records
only the LAST 2,000 characters of stdout.  Round 4's single
self-evidencing line grew past that window and lost its FRONT (the
"metric"/"value" headline), so BENCH_r04.json parsed as null.  Fix:
the FULL evidence object (per-rep cpu splits, probe seconds, notes) is
written to BENCH/bench_full.json, and stdout carries exactly ONE
compact line (headline + per-query seconds + per-rep docs/sec +
max-probe summary) guaranteed to fit the capture window.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "48000"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

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
    "dedup_incremental",
    "dedup_incremental_near",
    "dedup_incremental_emb",
    "dedup_passage",
    "dedup_embedding_pipeline",
    "ann_topk_bruteforce",
    "ann_topk_filtered",
    "ann_lsh_bucketed",
    "ann_ivf",
    "curate_corpus",
    "curate_decontaminate",
    "curate_quality_gate",
    "curate_token_budget",
    "curate_domain_mixture",
    "curate_pack_sequences",
    "web_url_dedup",
    "web_host_quality",
    "web_host_pagerank",
    "text_langid",
    "text_fingerprint",
    "text_top_ngrams",
    "text_repetition",
    "text_rarity",
    "dedup_keep_best",
    "dedup_containment",
    "dedup_lines",
    "dedup_bloom",
    "text_lm_score",
    "corpus_drift",
    "web_blocklist_filter",
    "curate_dsir",
    "dedup_semantic",
    "text_ppl_buckets",
    "web_distinct_hll",
    "web_recrawl_schedule",
    "web_crawl_depth",
    "curate_gopher_rules",
    "curate_c4_filters",
    "text_bpe_merges",
    "media_phash_dedup",
    "curate_length_dist",
]


def _membw(n_mb: int = 64) -> float:
    """Seconds for 2 copies of an n_mb buffer (memory-bandwidth probe,
    same kernel as scripts/scaling_bench.py)."""
    buf = bytes(n_mb * 1024 * 1024)
    t0 = time.perf_counter()
    x = bytearray(buf)
    y = bytes(x)
    del x, y
    return time.perf_counter() - t0


def host_probe(width: int) -> float:
    """Width-wide concurrent membw probe (seconds; ~0.25s quiet at 32
    on this box).  Forked workers only copy buffers — safe next to the
    running JVM (a separate process)."""
    with mp.Pool(width) as p:
        t0 = time.perf_counter()
        p.map(_membw, [64] * width)
        return time.perf_counter() - t0


def cpu_ticks() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def cpu_split(t0: list[int], t1: list[int]) -> dict[str, float]:
    d = [b - a for a, b in zip(t0, t1)]
    total = sum(d) or 1
    lab = dict(zip(("user", "nice", "sys", "idle", "iowait", "irq", "sirq",
                    "steal"), d))
    return {k: round(100.0 * lab.get(k, 0) / total, 1)
            for k in ("user", "sys", "iowait", "steal", "idle")}


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
    # materialization is untimed).
    reps: list[dict] = []
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
        for trial in range(REPS):
            p_before = host_probe(cpus)
            c0 = cpu_ticks()
            t0 = time.time()
            m = run_job(
                spark,
                inp,
                os.path.join(tmp, f"out{trial}"),
                os.path.join(tmp, f"lineage{trial}"),
                f"bench{trial}",
            )
            wall = round(time.time() - t0, 3)
            c1 = cpu_ticks()
            p_after = host_probe(cpus)
            queries[f"extract_job_t{trial}"] = wall
            reps.append({
                "docs_per_sec": round(m["docs_per_sec"], 2),
                "wall_s": wall,
                "probe_before_s": round(p_before, 2),
                "probe_after_s": round(p_after, 2),
                "cpu_pct": cpu_split(c0, c1),
                "n_ok": m["n_ok"],
            })
        med = statistics.median(r["docs_per_sec"] for r in reps)
        n_ok = reps[0]["n_ok"]

    suite_probe_before = host_probe(cpus)
    qmap = entry.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        # noop sink forces FULL materialization of every output column —
        # count() lets Catalyst prune projected columns, so select-only
        # queries (text_*, extract_documents) would skip the measured
        # md5/regex/UDF work entirely (CLAUDE.md gotcha #7)
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)
    suite_probe_after = host_probe(cpus)

    total = round(sum(queries.values()), 3)
    all_probes = [p for r in reps for p in
                  (r["probe_before_s"], r["probe_after_s"])]
    all_probes += [round(suite_probe_before, 2), round(suite_probe_after, 2)]
    max_probe = max(all_probes)
    full = {
        "metric": "extraction_docs_per_sec",
        "value": round(med, 2),
        "unit": "docs/sec",
        "total_sec": total,
        "queries": queries,
        "sf": sf_dir,
        "cpus": cpus,
        "bench_pages": BENCH_PAGES,
        "n_ok": n_ok,
        "reps": reps,
        "suite_probe_s": [round(suite_probe_before, 2),
                          round(suite_probe_after, 2)],
        "probe_note": (
            f"probe_*_s = {cpus}-wide concurrent 128MB-copy membw "
            "probe seconds (quiet host ~0.25s at 32-wide; degraded "
            "windows multiply it); cpu_pct = /proc/stat split over "
            "the rep; headline value = median docs/sec of "
            f"{REPS} reps"
        ),
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    evidence_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_full.json")
    with open(evidence_path, "w") as f:
        json.dump(full, f, indent=1)
    # ONE compact stdout line, guaranteed < 2,000 chars (driver tail window):
    # headline first, full per-rep/probe evidence in BENCH/bench_full.json.
    compact = {
        "metric": "extraction_docs_per_sec",
        "value": round(med, 2),
        "unit": "docs/sec",
        "total_sec": total,
        "queries": queries,
        "sf": sf_dir,
        "cpus": cpus,
        "bench_pages": BENCH_PAGES,
        "reps_docs_per_sec": [r["docs_per_sec"] for r in reps],
        "max_probe_s": max_probe,
        "probes_ok": max_probe <= 4.0,
        "evidence": "BENCH/bench_full.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # never let the headline fall out of the window
        compact.pop("queries")
        compact["queries_in"] = "BENCH/bench_full.json"
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
