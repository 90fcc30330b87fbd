"""Guards for the pinned-replay oracle machinery (scripts/replay_sketches.py).

The 8 formerly rows-only queries are oracled by a pure-Python replay;
its foundation is a spec-exact XXH64 that must keep matching Spark's
F.xxhash64 bit-for-bit, including the column-chaining behaviour."""

import importlib.util
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _replay():
    spec = importlib.util.spec_from_file_location(
        "replay_sketches", os.path.join(REPO, "scripts", "replay_sketches.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pure_python_xxh64_matches_spark(spark):
    R = _replay()
    samples = ["", "a", "hello world", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
               "v" * 100, "émoji ✨ unicode", "tab\tnl\n"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    exp = [R._signed(R.xxh64(s.encode(), 42)) for s in samples]
    assert got == exp

    # chained IntegerType literal + string (the minhash permutation shape)
    for j in (0, 7, 31):
        got = [r[0] for r in df.select(F.xxhash64(F.lit(j), "s")).collect()]
        exp = [R.spark_xxhash64(("i", j), s) for s in samples]
        assert got == exp, j

    # chained longs (the LSH band-bucket shape), incl. extremes
    longs = [(1, -2, 3, 4), (-(2 ** 63), 2 ** 63 - 1, 0, -1)]
    dfl = spark.createDataFrame(longs, "a long, b long, c long, d long")
    got = [r[0] for r in dfl.select(F.xxhash64("a", "b", "c", "d")).collect()]
    assert got == [R.spark_xxhash64(*t) for t in longs]


def test_fold_cosine_matches_jvm_aggregate(spark):
    """The replay's left-fold cosine must be bit-identical to the JVM
    F.aggregate fold (CLAUDE.md gotcha #16: numpy pairwise summation is
    NOT — this is why the replay avoids numpy for the rerank)."""
    import pandas as pd

    R = _replay()
    e = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet").head(20)
    vecs = [[float(x) for x in v] for v in e["embedding"]]
    rows = [(i, vecs[0], v) for i, v in enumerate(vecs[1:], 1)]
    df = spark.createDataFrame(rows, "i int, a array<double>, b array<double>")
    dot = F.aggregate(F.zip_with("a", "b", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("a", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("b", F.lit(0.0), lambda acc, x: acc + x * x))
    got = {r["i"]: r["c"] for r in
           df.select("i", (dot / (na * nb)).alias("c")).collect()}
    for i, _, v in rows:
        assert got[i] == R._fold_cosine(vecs[0], v), i


def test_sketch_invariants_file_sane():
    """The pinned file must cover all 12 replayed queries with all three
    sf keys for table-derived ones (driver gate sf0.01, test suite
    sf0.001, bench sf0.1)."""
    import json

    inv = json.load(open(os.path.join(REPO, "tests", "golden",
                                      "sketch_invariants.json")))
    keyed = {"dedup_minhash_lsh", "dedup_simhash", "dedup_pipeline",
             "dedup_incremental_near", "dedup_incremental_emb",
             "ann_lsh_bucketed", "ann_ivf",
             "dedup_embedding_pipeline"}
    fixture = {"media_features", "media_audio_features",
               "media_frame_sample", "media_resize"}
    assert set(inv) == keyed | fixture
    for name in keyed:
        assert len(inv[name]["sets"]) == 3, name
        assert all(rows for rows in inv[name]["sets"].values()), name
    for name in fixture:
        assert inv[name]["rows"], name


def test_oracle_sql_covers_all_queries():
    """With the pinned-replay oracles, EVERY queries() entry now has an
    oracle_sql() entry — the no_oracle count is 0."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert missing == set(), missing
