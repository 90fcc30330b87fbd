"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT the driver contract (bench.py is frozen for measurement) — this is
the round-7 optimization harness: times individual queries through the
noop sink with interleaved repetitions and host-weather probes
(CLAUDE.md gotchas #1/#17: the VM is bimodal, so single runs swing 2x;
medians over interleaved reps + membw probes make numbers judgeable),
and captures `.explain("formatted")` per query for the plan evidence in
plans/r07/.

Usage:
    python scripts/bench_extra.py --queries dedup_semantic,dedup_lines \
        [--sf /root/testdata/sf0.1] [--reps 3] [--explain plans/r07 --suffix before]

Prints one JSON line: {"queries": {name: {"med": s, "min": s, "samples": [...]}},
"max_probe_s": p, "probes_ok": bool}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_probe  # noqa: E402  (same probe kernel as the frozen bench)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names (or 'all')")
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>_<suffix>.txt plans into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS",
                                               os.cpu_count() or 4)))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES
    from document_extraction_service_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]", app_name="bench_extra")
    qmap = entry.queries()
    if args.queries == "all":
        names = list(qmap)
    elif args.queries == "bench":
        names = list(BENCH_QUERIES)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = qmap[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

    samples: dict[str, list[float]] = {n: [] for n in names}
    probes: list[float] = []
    # interleaved: full pass over all queries per rep, so one degraded
    # host window cannot straddle all reps of one query
    for _ in range(args.reps):
        probes.append(host_probe(args.cpus))
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qmap[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    probes.append(host_probe(args.cpus))

    out = {
        "sf": args.sf,
        "cpus": args.cpus,
        "queries": {
            n: {"med": round(statistics.median(s), 3), "min": min(s),
                "samples": s}
            for n, s in samples.items()
        },
        "probes_s": [round(p, 2) for p in probes],
        "max_probe_s": round(max(probes), 2),
        "probes_ok": max(probes) <= 4.0,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
