"""Diagnose the bimodal 150k local[32] job: per-rep phase breakdown +
/proc/stat CPU accounting (user/sys/iowait/steal) captured around each
run — distinguishes hypervisor steal from GC/sys-CPU pathology.

    python scripts/diag32.py [n_pages] [reps] [opts_a] [opts_b]
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OPTS = sys.argv[3:] if len(sys.argv) > 3 else ["", "compression=zstd,parquet.enable.dictionary=false"]
CORES = int(os.environ.get("SPARK_GRAFT_AB_CORES", "32"))


def cpu_ticks() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def run_once(input_dir: str, opts: str, tag: str) -> tuple[dict, list[int]]:
    with tempfile.TemporaryDirectory() as tmp:
        env = dict(os.environ, SPARK_GRAFT_WRITE_OPTS=opts)
        t0 = cpu_ticks()
        out = subprocess.run(
            [sys.executable, "-m", "document_extraction_service_spark.job",
             "--input", input_dir, "--output", os.path.join(tmp, "out"),
             "--lineage", os.path.join(tmp, "lineage"),
             "--run-id", f"diag-{tag}", "--master", f"local[{CORES}]"],
            cwd=REPO, capture_output=True, text=True, check=True, env=env,
        ).stdout
        dt = [b - a for a, b in zip(t0, cpu_ticks())]
        last = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        return ast.literal_eval(last), dt


def main() -> None:
    input_tmp = tempfile.mkdtemp(prefix="diag_pages_")
    input_dir = os.path.join(input_tmp, "pages")
    print(f"materializing {N_PAGES} bucketed pages (untimed) ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_input.py"),
         str(N_PAGES), input_dir],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    for rep in range(REPS):
        for opts in OPTS:
            name = opts if opts else "base-snappy"
            m, d = run_once(input_dir, opts, f"{rep}")
            total = sum(d) or 1
            # /proc/stat: user nice system idle iowait irq softirq steal
            lab = dict(zip(
                ("user", "nice", "sys", "idle", "iowait", "irq", "sirq", "steal"),
                d))
            pct = {k: 100.0 * v / total for k, v in lab.items()}
            print(
                f"rep{rep} {name[:40]:40s} wall={m['wall_ms']:7d}ms "
                f"plan={m['plan_ms']:6d} write={m['write_ms']:7d} "
                f"lineage={m['lineage_ms']:6d} {m['docs_per_sec']:7.1f}d/s | "
                f"user={pct['user']:4.1f}% sys={pct['sys']:4.1f}% "
                f"io={pct['iowait']:4.1f}% steal={pct['steal']:4.1f}% "
                f"idle={pct['idle']:4.1f}%",
                flush=True,
            )
    import shutil
    shutil.rmtree(input_tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
