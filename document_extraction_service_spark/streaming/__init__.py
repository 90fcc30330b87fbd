"""Structured Streaming wrapper.

The reference has no streaming operators (SURVEY §2.9) and the
north_rule targets batch with snapshot resume — but the extraction UDF
chain is stateless per row, so it drops into readStream unchanged.
This module proves that property.
"""

from .stream_extract import stream_extraction  # noqa: F401
