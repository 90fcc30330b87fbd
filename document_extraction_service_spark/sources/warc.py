"""WARC source connector — Common Crawl's container format.

A crawl pipeline's raw input is not parquet: it is WARC/1.0 files
(ISO 28500) — concatenated records, each a header block (CRLF lines,
terminated by an empty line) followed by Content-Length payload bytes
and a CRLF CRLF separator.  `response` records carry the fetched HTTP
response (status line + HTTP headers + body); the page bytes are the
body after the first CRLF CRLF of the payload.

Spark-first shape: `spark.read.format("binaryFile")` lists the WARC
files as (path, content) rows — ONE TASK PER FILE, which is the
real-world parallelism unit (Common Crawl shards each crawl into
~64k files of ~1 GB precisely so that file-level parallelism
saturates a cluster; a 100 TB crawl is ~10^5 tasks with no further
splitting needed).  Record parsing runs in mapInPandas (pure-Python
byte scanning, stdlib only, Arrow-batched) and emits PAGES_SCHEMA
rows that feed the same extraction chain as the parquet path — the
connector is proven by byte-equality of the extraction output across
the two paths (tests/test_warc_source.py).

Robustness contract: malformed records (bad version line, missing or
non-integer Content-Length, truncated payload) are SKIPPED, never
raised — one corrupt record in a 1 GB file must not kill the file's
task.  Parsing is deterministic (no RNG/time/env), preserving the
job's byte-identical-replay contract.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import PAGES_SCHEMA

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def write_warc(path: str, records: list[dict], gzip_members: bool = False) -> None:
    """Minimal WARC/1.0 writer (the test/fixture twin of read_warc).
    Each record: {"url", "ts" (datetime|None), "payload" (bytes),
    "warc_type" ("response" default), "http" (bool: wrap payload in a
    stock HTTP/1.1 200 header block)}.  gzip_members=True writes each
    record as its own gzip member — the Common Crawl .warc.gz layout."""
    import gzip

    with open(path, "wb") as f:
        for r in records:
            payload = r["payload"]
            if r.get("http"):
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(payload)).encode() + _SEP
                    + payload
                )
            headers = [
                b"WARC/1.0",
                b"WARC-Type: " + r.get("warc_type", "response").encode(),
                b"WARC-Target-URI: " + r["url"].encode(),
            ]
            ts = r.get("ts")
            if ts is not None:
                headers.append(
                    b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
                )
            headers.append(b"Content-Length: " + str(len(payload)).encode())
            rec = _CRLF.join(headers) + _SEP + payload + _SEP
            f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)


def _parse_warc_bytes(
    content: bytes, want_type: bytes = b"response"
) -> Iterator[tuple[str, object, bytes]]:
    """Yield (url, warc_ts|None, payload_bytes) for every well-formed
    record of `want_type`; skip everything malformed.  Inter-record
    CR/LF padding is tolerated (real WARCs use exactly CRLF CRLF; the
    WET sink's text-writer output inserts an extra LF per record)."""
    pos, n = 0, len(content)
    while pos < n:
        while pos < n and content[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return
        head_end = content.find(_SEP, pos)
        if head_end < 0:
            return
        lines = content[pos:head_end].split(_CRLF)
        body_start = head_end + len(_SEP)
        if not lines or not lines[0].startswith(b"WARC/"):
            return  # lost framing: stop rather than misparse payload bytes
        hdr = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                hdr[k.strip().lower()] = v.strip()
        try:
            length = int(hdr.get(b"content-length", b""))
        except ValueError:
            return  # cannot frame the payload -> cannot resync
        body_end = body_start + length
        if body_end > n:
            return  # truncated final record
        pos = body_end  # separator consumed by the whitespace skip above
        if hdr.get(b"warc-type") != want_type:
            continue
        url = hdr.get(b"warc-target-uri")
        if not url:
            continue
        payload = content[body_start:body_end]
        if payload[:5] == b"HTTP/":
            http_end = payload.find(_SEP)
            payload = payload[http_end + len(_SEP):] if http_end >= 0 else b""
        ts = None
        raw_ts = hdr.get(b"warc-date")
        if raw_ts:
            try:
                ts = datetime.datetime.strptime(
                    raw_ts.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ"
                )
            except ValueError:
                ts = None
        yield url.decode("utf-8", "replace"), ts, payload


def write_wet(df: DataFrame, path: str) -> None:
    """WET sink — Common Crawl's extracted-text distribution format
    (WARC `conversion` records, one per page).  Input: a DataFrame
    with url, extracted_text and bucket columns (the extraction
    output's natural projection); output: bucket-partitioned text
    files of WET records.

    The record is assembled as ONE codegen'd string concat (JVM-side,
    no Python), so the sink costs what the write costs; Content-Length
    is `octet_length` (UTF-8 BYTES — `length` counts chars and would
    mis-frame any non-ASCII page).  Record framing survives the text
    writer's per-row LF because the parser skips inter-record CR/LF
    padding."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nContent-Length: "),
        F.octet_length("extracted_text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("extracted_text"),
        F.lit("\r\n"),
    )
    (
        df.select(rec.alias("value"), "bucket")
        .write.mode("overwrite")
        # per-write dynamic overwrite (CLAUDE.md gotcha #5): a resumed
        # job writes only its remaining buckets — static overwrite
        # would delete every previously-committed WET bucket first
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .text(path)
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET source: conversion records -> (url, warc_ts, text) — the
    entry point for re-curating an already-extracted text corpus
    (every dedup/quality operator in this engine runs on exactly this
    shape).  Same one-task-per-file scale unit as read_warc."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                (url, ts, payload.decode("utf-8", "replace"))
                for content in b["content"]
                for url, ts, payload in _parse_warc_bytes(
                    bytes(content), want_type=b"conversion"
                )
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    return files.mapInPandas(
        parse, "url string, warc_ts timestamp, text string"
    )


def _maybe_gunzip(content: bytes) -> bytes:
    """Transparent .warc.gz support: Common Crawl ships WARCs as
    CONCATENATED per-record gzip members (so a reader can seek to a
    record offset and inflate one member); Python's gzip.decompress
    inflates all members of a concatenated stream, which covers both
    member-per-record and whole-file compression.  Corrupt gzip ->
    empty (skip the file, don't kill the task)."""
    if content[:2] != b"\x1f\x8b":
        return content
    import gzip

    try:
        return gzip.decompress(content)
    except OSError:
        return b""


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file glob (plain or .warc.gz) -> PAGES_SCHEMA DataFrame
    (text/lang NULL — a crawl source has no pre-extracted text).  One
    task per file; see the module docstring for why that is the right
    unit at 100 TB."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                (url, ts, html, None, None)
                for content in b["content"]
                for url, ts, html in _parse_warc_bytes(
                    _maybe_gunzip(bytes(content))
                )
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(parse, PAGES_SCHEMA)
