"""Source connectors beyond parquet: WARC (the Common Crawl container
format) — see warc.py."""

from .warc import read_warc, write_warc  # noqa: F401
