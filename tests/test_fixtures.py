"""Fixture-generator invariants (FIXTURES.md §1-2)."""

import collections

from document_extraction_service_spark import fixtures as fx


def test_determinism():
    for i in (0, 1, 7, 99, 312):
        assert fx.gen_page(i) == fx.gen_page(i)


def test_pages_shape():
    r = fx.gen_page(3)
    assert set(r) == {"url", "warc_ts", "html", "text", "lang"}
    assert isinstance(r["html"], bytes)
    assert r["url"].startswith("https://")


def test_family_shares():
    fams = collections.Counter(fx.family_of(i) for i in range(2000))
    assert 0.35 < fams["article"] / 2000 < 0.45
    assert 0.15 < fams["boilerplate"] / 2000 < 0.25
    assert 0.10 < fams["tabular"] / 2000 < 0.20
    assert 0.01 < fams["edge"] / 2000 < 0.06
    assert 0.01 < fams["adversarial"] / 2000 < 0.06


def test_host_skew():
    hosts = collections.Counter(fx.gen_page(i)["url"].split("/")[2] for i in range(1000))
    top = hosts.most_common(1)[0][1] / 1000
    assert 0.3 < top < 0.5  # one host owns ~40%


def test_crawl_text_is_not_the_answer():
    from document_extraction_service_spark.extract.pipeline import extract_document

    r = fx.gen_page(2)
    res = extract_document(r["html"], r["url"], r["lang"])
    assert res["extraction"]["extracted_text"] != r["text"]


def test_arrow_table_matches_gen_rows():
    t = fx.arrow_table(20)
    assert t.num_rows == 20
    rows = list(fx.gen_rows(0, 20))
    assert t.column("url").to_pylist() == [r["url"] for r in rows]
    assert t.column("html").to_pylist() == [r["html"] for r in rows]


def test_bench_queries_all_registered():
    """A typo'd name in bench.py's suite would crash the driver's
    per-round bench run — every BENCH_QUERIES entry must resolve."""
    import bench
    import __spark_entry__ as entry

    registered = set(entry.queries())
    missing = [q for q in bench.BENCH_QUERIES if q not in registered]
    assert not missing, missing
