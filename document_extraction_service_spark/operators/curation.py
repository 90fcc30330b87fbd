"""End-to-end corpus curation: the composite query a training-data
pipeline actually runs, built from the engine's own operators —

    exact dedup (canonical doc per content hash)
    -> language gate (n-gram/stopword langid == 'en')
    -> quality gate (rational-arithmetic score >= threshold)
    -> per-source token budget report

One DuckDB-oracled query proving the stages COMPOSE with exact
cross-engine semantics, not just pass in isolation.  Scale shape: one
hash shuffle for the dedup groupBy, everything else is map + one final
small aggregation; no stage widens the data (the text column never
survives past the per-doc scoring projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import LANG_MARKERS, TOKEN_RE, TOKEN_RE_SPARK, _marker_hits

QUALITY_MIN = 0.5   # floored score threshold (same floored value both engines)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def curate_corpus(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    with_fp = d.withColumn("fp", fp)
    canon = with_fp.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    kept = (
        with_fp.join(canon, "fp")
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .drop("fp", "canonical_id")
    )

    hits = {lg: _marker_hits(lg).alias(f"{lg}_hits") for lg in LANG_MARKERS}
    n_words = F.size(F.split(F.trim(F.col("text")), " "))
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    scored = kept.select(
        "doc_id", "source", n_words.alias("n_words"),
        n_alpha.alias("n_alpha"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE_SPARK}', 0)"))
        .alias("n_tokens"),
        *hits.values(),
    )
    best = F.greatest(*[F.col(f"{lg}_hits") for lg in LANG_MARKERS])
    pred = (
        F.when(best == 0, F.lit("unknown"))
        .when(F.col("en_hits") == best, F.lit("en"))
        .when(F.col("de_hits") == best, F.lit("de"))
        .when(F.col("fr_hits") == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    q = (
        F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(F.col("en_hits") / F.col("n_words") * 5.0, F.lit(1.0)) * 0.4
        + F.least((F.col("n_alpha") / F.col("n_words")) / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    per_doc = scored.select(
        "doc_id", "source", "n_tokens",
        pred.alias("pred_lang"),
        (F.floor(q * 1_000_000) / 1_000_000).alias("quality"),
    ).filter((F.col("pred_lang") == "en") & (F.col("quality") >= QUALITY_MIN))

    dec = "decimal(18,6)"
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        # floored 6-decimal scores are exact in DECIMAL(18,6): the sum
        # (and thus the mean) is order-independent across partitionings
        (F.floor(
            (F.sum(F.col("quality").cast(dec)).cast("double") / F.count(F.lit(1)))
            * 1_000_000
        ) / 1_000_000).alias("avg_quality"),
    )


_EN = r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b"
_DE = r"\b(" + "|".join(LANG_MARKERS["de"]) + r")\b"
_FR = r"\b(" + "|".join(LANG_MARKERS["fr"]) + r")\b"
_ES = r"\b(" + "|".join(LANG_MARKERS["es"]) + r")\b"

SQL_CURATE = f"""
WITH f AS (SELECT *, md5(lower(trim(text))) AS fp FROM documents),
c AS (SELECT fp, MIN(doc_id) AS canonical_id FROM f GROUP BY fp),
kept AS (SELECT f.* FROM f JOIN c ON f.fp = c.fp AND f.doc_id = c.canonical_id),
s AS (SELECT doc_id, source,
             len(string_split(trim(text), ' ')) AS n_words,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
             len(regexp_extract_all(lower(text), '{_EN}')) AS en_hits,
             len(regexp_extract_all(lower(text), '{_DE}')) AS de_hits,
             len(regexp_extract_all(lower(text), '{_FR}')) AS fr_hits,
             len(regexp_extract_all(lower(text), '{_ES}')) AS es_hits
      FROM kept),
p AS (SELECT doc_id, source, n_tokens,
             CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'unknown'
                  WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
                  WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
                  WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
                  ELSE 'es' END AS pred_lang,
             floor((least(n_words / 100.0, 1.0) * 0.4
                    + least(en_hits * 1.0 / n_words * 5.0, 1.0) * 0.4
                    + least((n_alpha * 1.0 / n_words) / 8.0, 1.0) * 0.2)
                   * 1000000) / 1000000 AS quality
      FROM s)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       FLOOR(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             * 1000000) / 1000000 AS avg_quality
FROM p
WHERE pred_lang = 'en' AND quality >= {QUALITY_MIN}
GROUP BY source
"""

# per-language sampling rates for the stratified sampler (a training
# mix: over-sample high-resource quality langs, down-sample the tail)
SAMPLE_RATES = {"en": 0.5, "de": 0.5, "fr": 0.25, "es": 0.25}
SAMPLE_DEFAULT_RATE = 0.1


def curate_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling by language — the step that
    turns a curated pool into a training MIX.  The sampling decision is
    a pure function of doc_id (first 32 bits of md5 -> frac in [0,1);
    keep iff frac < rate[lang]): no RNG, so reruns/resumes/audits select
    the SAME docs, and the operator is a pure map — no shuffle, no
    state, embarrassingly parallel at 10^12 rows.  (Production would use
    xxhash64 for speed; md5 keeps the oracle exact in SQL — same
    engine-independent-hash reasoning as text_fingerprint.)"""
    d = _t(spark, sf_dir, "documents")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") / F.lit(4294967296.0)
    )
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for lg, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    return (
        d.select(
            "doc_id", "lang",
            frac.alias("_frac"),
            rate.alias("_rate"),
        )
        .filter(F.col("_frac") < F.col("_rate"))
        .select(
            "doc_id", "lang",
            (F.floor(F.col("_frac") * 1_000_000) / 1_000_000).alias("sample_frac"),
        )
    )


_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lg}' THEN {r}" for lg, r in sorted(SAMPLE_RATES.items())
) + f" ELSE {SAMPLE_DEFAULT_RATE} END"

SQL_SAMPLE = f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           / 4294967296.0 AS frac
  FROM documents)
SELECT doc_id, lang, FLOOR(frac * 1000000) / 1000000 AS sample_frac
FROM s
WHERE frac < {_RATE_CASE}
"""

QUERIES = {
    "curate_corpus": curate_corpus,
    "curate_sample_stratified": curate_sample_stratified,
}
ORACLES = {
    "curate_corpus": SQL_CURATE,
    "curate_sample_stratified": SQL_SAMPLE,
}
