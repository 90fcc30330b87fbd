"""URL canonicalization + host rollup — web-pipeline table stakes.

A crawl pipeline dedups and shards by CANONICAL url: scheme/host case,
default ports, fragments and tracking params all create spurious
distinct keys (the same page under 8 byte-distinct urls).  No reference
analog (the service takes opaque PDF uploads); this is the url-side
twin of the engine's url-hash bucketing (job.py).

The demo query synthesizes messy urls from the documents table with
pure JVM column expressions — the same construction is expressed in the
DuckDB oracle, so canonicalization is value-provable in SQL (the
extract_documents pattern).  All transforms are built-in string
functions (regexp_replace/lower/split) — zero Python on the hot path,
so at 10^12 rows this is a pure map stage inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tracking params dropped during canonicalization (order-preserving
# keep-list semantics for everything else)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _messy_urls(spark, sf_dir):
    """Deterministic messy-url table from documents (JVM-side only):
    mixed-case scheme+host, default port, tracking + real params, and a
    fragment — every class of non-canonical noise."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".Example.COM:443/Articles/item-"), F.col("doc_id").cast("string"),
            F.lit("?utm_source=feed&id="), F.col("doc_id").cast("string"),
            F.lit("&utm_campaign=x&page=2#section-3"),
        ).alias("url"),
    )


def canonicalize(url):
    """Column -> canonical url Column:
    1. drop the #fragment
    2. lowercase scheme://host[:port] (path/query case is significant)
    3. strip default ports (:443 https, :80 http)
    4. drop tracking query params (TRACKING_PREFIXES), keep the rest in
       original order; drop a then-empty '?'
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme+authority only: capture up to the first '/' after '//'
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, r"^([^/]*//[^/]*)", 1)),
        F.regexp_replace(no_frag, r"^[^/]*//[^/]*", ""),
    )
    no_port = F.regexp_replace(
        F.regexp_replace(lowered, r"^(https://[^/:]*):443(/|$)", r"$1$2"),
        r"^(http://[^/:]*):80(/|$)", r"$1$2",
    )
    base = F.regexp_extract(no_port, r"^([^?]*)", 1)
    query = F.regexp_extract(no_port, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~(
            p.startswith("utm_") | p.startswith("fbclid")
            | p.startswith("gclid") | p.rlike("^ref=")
        ),
    )
    return F.when(
        (query == "") | (F.size(kept) == 0), base
    ).otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))


def host_of(url):
    """Column -> lowercase host, www. stripped, port dropped."""
    h = F.lower(F.regexp_extract(url, r"^[^/]*//([^/:?#]*)", 1))
    return F.regexp_replace(h, r"^www\.", "")


def web_url_canonicalize(spark, sf_dir):
    """queries() entry: canonical url + host per doc — map-only."""
    u = _messy_urls(spark, sf_dir)
    return u.select(
        "doc_id",
        "url",
        canonicalize(F.col("url")).alias("canonical_url"),
        host_of(F.col("url")).alias("host"),
    )


def web_host_rollup(spark, sf_dir):
    """queries() entry: per-host page counts + total doc length — the
    crawl-ops rollup.  host is computed inline from the url expression
    (ONE scan, map + partial agg — a join back to the source table
    would be a pointless self-join; the plan is scan -> project ->
    hash-agg with map-side combine)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".Example.COM:443/Articles/item-"), F.col("doc_id").cast("string"),
    )
    return (
        d.select(host_of(url).alias("host"), "n_chars")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # decimal route: aggregation order cannot change the value
            F.sum(F.col("n_chars").cast("decimal(18,6)")).cast("double").alias("sum_chars"),
        )
    )


# DuckDB mirrors: same messy-url construction, same transforms.
_MESSY_SQL = """
SELECT doc_id,
       'HTTPS://WWW.Site' || CAST(doc_id % 20 AS VARCHAR) ||
       '.Example.COM:443/Articles/item-' || CAST(doc_id AS VARCHAR) ||
       '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) ||
       '&utm_campaign=x&page=2#section-3' AS url
FROM documents
"""

SQL_URL_CANONICALIZE = f"""
WITH u AS ({_MESSY_SQL}),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf FROM u),
s2 AS (SELECT doc_id, url,
              lower(regexp_extract(nf, '^([^/]*//[^/]*)', 1)) ||
              regexp_replace(nf, '^[^/]*//[^/]*', '') AS lo FROM s1),
s3 AS (SELECT doc_id, url,
              regexp_replace(regexp_replace(lo,
                  '^(https://[^/:]*):443(/|$)', '\\1\\2'),
                  '^(http://[^/:]*):80(/|$)', '\\1\\2') AS np FROM s2),
s4 AS (SELECT doc_id, url,
              regexp_extract(np, '^([^?]*)', 1) AS base,
              regexp_extract(np, '\\?(.*)$', 1) AS query FROM s3),
s5 AS (SELECT doc_id, url, base, query,
              list_filter(string_split(query, '&'),
                          p -> NOT (p LIKE 'utm\\_%' ESCAPE '\\'
                                    OR p LIKE 'fbclid%' OR p LIKE 'gclid%'
                                    OR regexp_matches(p, '^ref='))) AS kept
       FROM s4)
SELECT doc_id, url,
       CASE WHEN query = '' OR len(kept) = 0 THEN base
            ELSE base || '?' || array_to_string(kept, '&') END AS canonical_url,
       regexp_replace(lower(regexp_extract(url, '^[^/]*//([^/:?#]*)', 1)),
                      '^www\\.', '') AS host
FROM s5
"""

SQL_HOST_ROLLUP = """
WITH h AS (
  SELECT regexp_replace(lower(regexp_extract(
           'HTTPS://WWW.Site' || CAST(doc_id % 20 AS VARCHAR) ||
           '.Example.COM:443/Articles/item-' || CAST(doc_id AS VARCHAR),
           '^[^/]*//([^/:?#]*)', 1)), '^www\\.', '') AS host,
         n_chars
  FROM documents)
SELECT host, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) AS sum_chars
FROM h
GROUP BY host
"""

QUERIES = {
    "web_url_canonicalize": web_url_canonicalize,
    "web_host_rollup": web_host_rollup,
}
ORACLES = {
    "web_url_canonicalize": SQL_URL_CANONICALIZE,
    "web_host_rollup": SQL_HOST_ROLLUP,
}
