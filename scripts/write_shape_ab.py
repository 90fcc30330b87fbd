"""Write-stage SHAPE A/B at local[32]: where does the encode time go?

Variants over the same materialized bucketed input, one subprocess per
(variant, rep), interleaved:

  noop        — scan + UDF only (the known ~hardware-ceiling bound)
  full        — the real output row (nested extraction struct)
  json        — extraction pre-serialized to ONE json string column
  status-only — drop the extraction payload entirely

    python scripts/write_shape_ab.py [n_pages] [reps]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = int(os.environ.get("SPARK_GRAFT_AB_CORES", "32"))
VARIANTS = ("noop", "full", "json", "status-only")

_WORKER = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from document_extraction_service_spark.schema import bucketed_pages_schema
from document_extraction_service_spark.session import build_session
from document_extraction_service_spark.udfs import extraction_col

variant, inp, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
spark = build_session(master="local[{cores}]", app_name=f"shape-{{variant}}")
pages = spark.read.schema(bucketed_pages_schema()).parquet(inp)
ex = (pages.select("url", "warc_ts", "html", "lang", "text", "bucket")
      .withColumn("_res", extraction_col()))
if variant == "full":
    out = ex.select("url", "warc_ts", "bucket",
                    F.col("_res.extraction").alias("extraction"),
                    F.col("_res.status").alias("status"))
elif variant == "json":
    out = ex.select("url", "warc_ts", "bucket",
                    F.to_json("_res.extraction").alias("extraction_json"),
                    F.col("_res.status").alias("status"))
elif variant == "status-only":
    out = ex.select("url", "warc_ts", "bucket",
                    F.col("_res.status").alias("status"))
else:
    out = ex.select("url", "bucket", F.col("_res.status.ok").alias("ok"))
t0 = time.time()
if variant == "noop":
    out.write.format("noop").mode("overwrite").save()
else:
    out.write.mode("overwrite").partitionBy("bucket").parquet(outdir)
dt = time.time() - t0
size = sum(os.path.getsize(os.path.join(r, f))
           for r, _, fs in os.walk(outdir) for f in fs) if variant != "noop" else 0
print(f"RESULT {{dt:.3f}} {{size}}")
spark.stop()
"""


def main() -> None:
    input_tmp = tempfile.mkdtemp(prefix="shape_pages_")
    input_dir = os.path.join(input_tmp, "pages")
    print(f"materializing {N_PAGES} bucketed pages (untimed) ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_input.py"),
         str(N_PAGES), input_dir],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    worker = _WORKER.format(repo=REPO, cores=CORES)
    samples: dict[str, list[tuple[float, int]]] = {v: [] for v in VARIANTS}
    for rep in range(REPS):
        for v in VARIANTS:
            with tempfile.TemporaryDirectory() as tmp:
                out = subprocess.run(
                    [sys.executable, "-c", worker, v, input_dir,
                     os.path.join(tmp, "out")],
                    cwd=REPO, check=True, capture_output=True, text=True,
                ).stdout
                line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
                dt, size = float(line.split()[1]), int(line.split()[2])
                samples[v].append((dt, size))
                print(f"rep{rep} {v:12s} stage={dt:7.2f}s out={size/1e6:7.1f}MB",
                      flush=True)
    print("\n== medians (scan+UDF+write stage seconds) ==")
    for v in VARIANTS:
        dt = statistics.median(t for t, _ in samples[v])
        size = statistics.median(s for _, s in samples[v]) / 1e6
        print(f"{v:12s} {dt:7.2f}s  out={size:7.1f}MB  "
              f"{N_PAGES/dt:8.1f} docs/s")
    import shutil
    shutil.rmtree(input_tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
