"""Exploratory (r7): single-session interleaved A/B of the width-guarded
scan redistribution (operators/tables.py) over the full bench suite.

Monkeypatches widen_narrow_scan to identity for the OFF arm; arms
alternate query-by-query so host weather cancels.  Prints per-query
(off_med, on_med, delta) sorted by delta.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES as _ALL  # noqa: E402

_SUBSET = os.environ.get("WIDEN_AB_QUERIES")
BENCH_QUERIES = _SUBSET.split(",") if _SUBSET else _ALL

ROUNDS = int(os.environ.get("WIDEN_AB_ROUNDS", "4"))


def main() -> None:
    import __spark_entry__ as entry
    from document_extraction_service_spark.operators import tables
    from document_extraction_service_spark.session import build_session

    spark = build_session(app_name="widen_ab_suite")
    qs = entry.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    real_widen = tables.widen_narrow_scan

    def set_on(on: bool) -> None:
        tables.widen_narrow_scan = (
            real_widen if on else (lambda df, path=None: df)
        )

    # warm both arms
    for on in (False, True):
        set_on(on)
        for n in BENCH_QUERIES:
            qs[n](spark, sf).write.format("noop").mode("overwrite").save()

    out: dict[tuple, list] = {}
    for rnd in range(ROUNDS):
        for n in BENCH_QUERIES:
            # alternate arm order per round: a fixed off-then-on order
            # hands the second arm the first arm's warm caches (measured
            # as phantom gains on arm-identical queries)
            order = (False, True) if rnd % 2 == 0 else (True, False)
            for on in order:
                set_on(on)
                spark.sparkContext.setJobDescription(
                    f"{'on' if on else 'off'}:{n}#{rnd}")
                t0 = time.time()
                qs[n](spark, sf).write.format("noop").mode("overwrite").save()
                out.setdefault((n, on), []).append(
                    round(time.time() - t0, 3))
    set_on(True)

    rows = []
    for n in BENCH_QUERIES:
        off = statistics.median(out[(n, False)])
        on = statistics.median(out[(n, True)])
        rows.append((on - off, n, off, on))
    rows.sort()
    t_off = sum(r[2] for r in rows)
    t_on = sum(r[3] for r in rows)
    print(f"TOTAL off {t_off:.1f}s  on {t_on:.1f}s  delta {t_on - t_off:+.1f}s")
    for d, n, off, on in rows:
        print(f"{n:26s} off {off:5.2f}  on {on:5.2f}  {d:+.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
