"""Scaling-efficiency evidence (BASELINE.md sandbox protocol).

Runs the identical extraction job at two local parallelism levels
(local[8] and local[32]) on the same deterministic synthetic input,
in separate subprocesses (one JVM cannot change master), and writes
docs/sec at both plus scaling efficiency to BENCH/BASELINE.md.

Efficiency = (thr_32 / thr_8) / (32 / 8); the north_rule requires
>= 0.8 from N to 4N.  Input is sized so each configuration runs
>= 60 s of extraction work.
"""

from __future__ import annotations

import ast
import datetime
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "150000"))


def run_at(cores: int, n_pages: int) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        cmd = [
            sys.executable, "-m", "document_extraction_service_spark.job",
            "--input", f"synthetic:{n_pages}",
            "--output", os.path.join(tmp, "out"),
            "--lineage", os.path.join(tmp, "lineage"),
            "--run-id", f"scale-{cores}",
            "--master", f"local[{cores}]",
        ]
        out = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, check=True
        ).stdout
        last = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        return ast.literal_eval(last)


def main() -> None:
    results = {}
    for cores in (8, 32):
        m = run_at(cores, N_PAGES)
        results[cores] = m
        print(f"local[{cores}]: {m['docs_per_sec']:.1f} docs/s  wall={m['wall_ms']}ms", flush=True)

    thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Protocol (BASELINE.md "sandbox evidence protocol"): the identical
extraction job (`document_extraction_service_spark.job`, synthetic
pages corpus, {N_PAGES} rows, seed=42) run at two local parallelism
levels on the same input; docs/sec measured over the job wall clock
(generate -> repartition by url-hash -> extract UDF -> parquet write
+ lineage), excluding JVM/session startup.

| config | docs/sec | wall_ms | n_ok |
|---|---|---|---|
| local[8]  (N)  | {thr8:.1f} | {results[8]['wall_ms']} | {results[8]['n_ok']} |
| local[32] (4N) | {thr32:.1f} | {results[32]['wall_ms']} | {results[32]['n_ok']} |

**Scaling efficiency (N -> 4N) = (thr_4N / thr_N) / 4 = {eff:.3f}**
(north_rule requirement: >= 0.8)

Generated {stamp} by scripts/scaling_bench.py.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
