"""Source connectors beyond parquet: WARC (the Common Crawl container
format) — see warc.py."""

from .jsonl import read_jsonl_pages  # noqa: F401
from .warc import read_warc, read_wet, write_warc, write_wet  # noqa: F401
