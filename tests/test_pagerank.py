"""web_host_pagerank: the fixed-point iteration must match an
independent pure-Python replay exactly (bit-identical integer math is
the operator's whole determinism contract), and the plan must keep the
iteration payload to (host, long) pairs."""

import duckdb

import __spark_entry__ as entry
from document_extraction_service_spark.operators.weburl import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_pagerank(doc_ids):
    """Independent replay: same graph synthesis, same fixed-point
    update, plain dicts and ints."""
    edges = {}
    for i in doc_ids:
        src = i % 20
        dst = (src + 1 + i % 7) % 20
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    outw = {}
    for (s, _), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(hosts)
    p0 = PR_SCALE // n
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * p0) // PR_DAMP_DEN
    p = {h: p0 for h in hosts}
    for _ in range(PR_ITERS):
        inflow = {h: 0 for h in hosts}
        for (s, d), w in edges.items():
            inflow[d] += (p[s] // outw[s]) * w
        p = {h: base + (PR_DAMP_NUM * inflow[h]) // PR_DAMP_DEN for h in hosts}
    return p


def test_pagerank_matches_python_replay(spark):
    doc_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    expect = _python_pagerank(doc_ids)
    got = {
        r["host"]: r["rank_fp"]
        for r in entry.queries()["web_host_pagerank"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_pagerank_mass_and_spread(spark):
    rows = entry.queries()["web_host_pagerank"](spark, SF_DIR).collect()
    total = sum(r["rank_fp"] for r in rows)
    # floor division only ever drops mass below the initial PR_SCALE
    assert 0 < total <= PR_SCALE
    # the synthesized graph is skewed: ranks must actually differ
    assert len({r["rank_fp"] for r in rows}) > 1
