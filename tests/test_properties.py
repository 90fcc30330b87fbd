"""Property-based tests (hypothesis) for the bound-critical pure
functions — the grid budget and the URL canonicalizer's algebraic
contract."""

from hypothesis import given, settings
from hypothesis import strategies as st

from document_extraction_service_spark.extract import tables as TB

cell = st.tuples(
    st.text(alphabet="ab ", max_size=5),
    st.booleans(),
    st.integers(min_value=1, max_value=64),   # colspan
    st.integers(min_value=1, max_value=8),    # rowspan
)
rows_strategy = st.lists(st.lists(cell, max_size=12), max_size=30)


@given(rows_strategy)
@settings(max_examples=200, deadline=None)
def test_fill_grid_bounded_and_rectangular(rows):
    """For ANY span structure: the padded grid never exceeds
    MAX_PADDED_CELLS, is rectangular, and row count never exceeds the
    input row count (spans only fill, never append rows)."""
    grid, truncated = TB.fill_grid(rows)
    total = sum(len(r) for r in grid)
    assert total <= TB.MAX_PADDED_CELLS
    widths = {len(r) for r in grid}
    assert len(widths) <= 1  # rectangular after padding
    assert len(grid) <= len(rows)
    # every cell is a (str, bool) pair — the downstream contract
    for r in grid:
        for t, th in r:
            assert isinstance(t, str) and isinstance(th, bool)


@given(rows_strategy)
@settings(max_examples=100, deadline=None)
def test_fill_grid_no_span_needs_no_truncation_under_budget(rows):
    """Small span-free tables must never be flagged truncated."""
    flat = [[(t, th, 1, 1) for (t, th, _, _) in row[:4]] for row in rows[:8]]
    _, truncated = TB.fill_grid(flat)
    assert not truncated


def test_canonicalize_idempotent_and_stable(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the algebraic
    contract that makes canonical urls safe as join/dedup keys — over
    an adversarial url corpus (one Spark job, JVM-side expressions)."""
    from pyspark.sql import functions as F

    from document_extraction_service_spark.operators.weburl import canonicalize

    urls = [
        "HTTPS://WWW.X.COM:443/a?utm_source=1&id=2#f",
        "http://x.com:80/",
        "https://x.com:8443/a?b=1",          # non-default port kept
        "https://x.com/?utm_a=1&utm_b=2",    # all params tracked -> bare
        "https://x.com/p?ref=abc&z=9",
        "https://x.com/no-query#frag-only",
        "HTTP://UPPER.HOST/MixedPath?Q=V",   # path case preserved
        "https://x.com:443",                  # port at end of authority
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize(F.col("url")).alias("c1"))
    twice = once.select("c1", canonicalize(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r["c1"] == r["c2"], r
    got = {r["c1"] for r in once.collect()}
    assert "https://www.x.com/a?id=2" in got
    assert "http://x.com/" in got
    assert "https://x.com:8443/a?b=1" in got
    assert "https://x.com/" in got
    assert "https://x.com/p?z=9" in got
    # scheme+host lowercased, path case preserved
    assert any(c.startswith("http://upper.host/MixedPath") for c in got)
