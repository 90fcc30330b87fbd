"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(normalize(r[i]) for i in order) for r in rows)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from document_extraction_service_spark.session import build_session

    spark = build_session(master="local[8]", app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        ddf = con.sql(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = frame_key(srows, scols) == frame_key(drows, dcols)
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(f"  {name:28s} {status} spark={len(srows)} duck={len(drows)} cols_match={ok_cols}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {scols}\n      duck  cols: {dcols}")
            elif ok_count:
                a = frame_key(srows, scols)
                b = frame_key(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark: {x}\n      duck : {y}")
            else:
                sa = set(map(tuple, frame_key(srows, scols)))
                sb = set(map(tuple, frame_key(drows, dcols)))
                print(f"      only-spark: {list(sa - sb)[:2]}")
                print(f"      only-duck : {list(sb - sa)[:2]}")
    spark.stop()
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("all oracle comparisons OK")


if __name__ == "__main__":
    main()
