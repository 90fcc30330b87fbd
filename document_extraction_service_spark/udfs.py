"""Vectorized UDF layer — the only Python on the hot path.

One iterator-form pandas UDF runs the whole per-document pipeline
(SURVEY §2.10 folds the reference's ~40 per-document operators into
the UDF chain).  The iterator form matters: module imports and
compiled regexes are paid once per Python worker, not per batch —
the inversion of the reference's per-document spaCy reload
(/root/reference/app/core/extraction_modul/extraction_model.py:87).

The UDF emits one compact JSON string per row; `F.from_json` with the
fixed RESULT schema parses it JVM-side into the nested struct.  JSON
is the Arrow-friendly transport for the deeply nested output type;
the schema itself stays fixed and declared (schema.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract.pipeline import extract_document
from .schema import RESULT

_JSON_SEP = (",", ":")


def _extract_series(html: pd.Series, url: pd.Series, lang: pd.Series) -> pd.Series:
    out = [
        json.dumps(
            extract_document(h, u, l),
            ensure_ascii=False,
            separators=_JSON_SEP,
        )
        for h, u, l in zip(html, url, lang)
    ]
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def extract_json_udf(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for html, url, lang in it:
        yield _extract_series(html, url, lang)


def extraction_col(html: str | Column = "html", url: str | Column = "url",
                   lang: str | Column = "lang") -> Column:
    """Column expression: parse+extract -> RESULT struct (JVM-parsed)."""
    return F.from_json(extract_json_udf(html, url, lang), RESULT)


def with_extraction(df: DataFrame) -> DataFrame:
    """pages df -> (url, warc_ts, extraction, status).

    The heavy `html` column is consumed here and not carried further —
    downstream stages and writes never shuffle page payloads.
    """
    return df.select(
        "url",
        "warc_ts",
        extraction_col().alias("_res"),
    ).select(
        "url",
        "warc_ts",
        F.col("_res.extraction").alias("extraction"),
        F.col("_res.status").alias("status"),
    )
