"""Write-stage A/B at local[32] (VERDICT r2 next-round #1).

The noop-sink isolation showed scan+UDF reaches the hardware ceiling at
32 cores; the collapse is in the JVM parquet encode of the nested
output structs.  This harness A/Bs the concrete encode levers —
compression codec, row-group (parquet.block.size) / page sizing,
dictionary encoding — on the SAME materialized bucketed input, with
configs interleaved across reps (CLAUDE.md gotcha #1: steal bursts hit
all configs equally only when interleaved) and per-config MEDIANS.

    python scripts/write_ab.py [n_pages] [reps]
"""

from __future__ import annotations

import ast
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = int(os.environ.get("SPARK_GRAFT_AB_CORES", "32"))

CONFIGS: dict[str, str] = {
    "base-snappy": "",
    "snappy-nodict": "parquet.enable.dictionary=false",
    "snappy-rg16m": "parquet.block.size=16777216",
    "snappy-rg16m-nodict": "parquet.block.size=16777216,parquet.enable.dictionary=false",
    "zstd-nodict": "compression=zstd,parquet.enable.dictionary=false",
    "zstd": "compression=zstd",
    # r7: zstd compression-level ladder (parquet reads the level from
    # the write conf; level 1 trades a few % size for encode CPU)
    "zstd1-nodict": ("compression=zstd,parquet.enable.dictionary=false,"
                     "parquet.compression.codec.zstd.level=1"),
    "zstd2-nodict": ("compression=zstd,parquet.enable.dictionary=false,"
                     "parquet.compression.codec.zstd.level=2"),
}


def run_once(input_dir: str, opts: str, tag: str) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        env = dict(os.environ, SPARK_GRAFT_WRITE_OPTS=opts)
        outdir = os.path.join(tmp, "out")
        out = subprocess.run(
            [sys.executable, "-m", "document_extraction_service_spark.job",
             "--input", input_dir, "--output", outdir,
             "--lineage", os.path.join(tmp, "lineage"),
             "--run-id", f"ab-{tag}", "--master", f"local[{CORES}]"],
            cwd=REPO, capture_output=True, text=True, check=True, env=env,
        ).stdout
        last = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        m = ast.literal_eval(last)
        m["out_bytes"] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(outdir) for f in fs
        )
        return m


def main() -> None:
    input_tmp = tempfile.mkdtemp(prefix="ab_pages_")
    input_dir = os.path.join(input_tmp, "pages")
    print(f"materializing {N_PAGES} bucketed pages (untimed) ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_input.py"),
         str(N_PAGES), input_dir],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    samples: dict[str, list[dict]] = {c: [] for c in CONFIGS}
    for rep in range(REPS):
        for name, opts in CONFIGS.items():
            m = run_once(input_dir, opts, f"{name}-{rep}")
            samples[name].append(m)
            print(f"rep{rep} {name:22s} write={m['write_ms']:6d}ms "
                  f"wall={m['wall_ms']:6d}ms {m['docs_per_sec']:8.1f} docs/s",
                  flush=True)
    print("\n== medians ==")
    for name in CONFIGS:
        ws = statistics.median(m["write_ms"] for m in samples[name])
        ds = statistics.median(m["docs_per_sec"] for m in samples[name])
        mb = statistics.median(m["out_bytes"] for m in samples[name]) / 1e6
        print(f"{name:22s} write={ws:8.0f}ms docs/s={ds:8.1f} out={mb:7.1f}MB")
    import shutil
    shutil.rmtree(input_tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
