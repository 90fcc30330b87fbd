"""Exploratory (r7): is dedup_semantic's verify stage parallelism
bounded by the centroid-cluster count (k=8 rows after the
collect_list groupBy, AQE-coalesced into very few partitions)?

A/B in context at sf0.1: the production query vs the same query with
the pair stream re-distributed before the O(dim) cosine folds.
Interleaved reps, noop sink, job-description labels.  Not a committed
benchmark — a hypothesis probe (guide §1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from document_extraction_service_spark.session import build_session
from document_extraction_service_spark.operators import dedup as D

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_repart(spark, sf_dir, n):
    """dedup_semantic with pairs.repartition(n) before the verify."""
    from pyspark.sql import Window

    e = D._t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select("vec_id", dv.alias("v"))
    assigned = D._semantic_assign_v(v, D.SEM_K)
    posts = (
        assigned.withColumn("nv", D._vnorm(F.col("v")))
        .groupBy("cent_id")
        .agg(F.collect_list(F.struct("vec_id", "v", "nv")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= D.EMB_BLOCK_CAP))
    )
    pairs = (
        posts.select(F.explode("docs").alias("a"), "docs")
        .select(
            "a",
            F.explode(
                F.filter("docs", lambda d: d["vec_id"] > F.col("a.vec_id"))
            ).alias("b"),
        )
    ).repartition(n)
    cos = D._dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
    verified = pairs.filter(cos >= D.EMB_COS_THRESHOLD).select(
        F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b")
    )
    cc = D.connected_components(verified)
    assign = assigned.select("vec_id", "cent_id", "cent_sim")
    j = cc.join(
        assign, cc.doc_id == assign.vec_id
    ).select("vec_id", "cent_id", "cent_sim", "cluster_id", "cluster_size")
    w = Window.partitionBy("cluster_id").orderBy(
        F.asc("cent_sim"), F.asc("vec_id")
    )
    return j.select(
        "vec_id", "cent_id", "cent_sim", "cluster_id", "cluster_size",
        (F.row_number().over(w) == 1).alias("kept"),
    )


def chunked_first_explode(spark, sf_dir):
    """dedup_semantic with the FIRST explode row-split so the pair
    space is generated across >= cores partitions without shuffling
    vectors: each cluster row fans out into ceil(size/C) chunk rows
    (chunk row = slice of `docs` for `a` + full docs for `b`), and the
    tiny (<=  k * size/C rows) chunk table round-robins across the
    executors before the heavy double explode."""
    from pyspark.sql import Window

    e = D._t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select("vec_id", dv.alias("v"))
    assigned = D._semantic_assign_v(v, D.SEM_K)
    posts = (
        assigned.withColumn("nv", D._vnorm(F.col("v")))
        .groupBy("cent_id")
        .agg(F.collect_list(F.struct("vec_id", "v", "nv")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= D.EMB_BLOCK_CAP))
    )
    C = 32  # chunk size of the `a` side
    chunks = (
        posts.withColumn(
            "ci",
            F.explode(
                F.sequence(
                    F.lit(0), F.ceil(F.size("docs") / C).cast("int") - 1
                )
            ),
        )
        .withColumn("a_chunk", F.slice("docs", F.col("ci") * C + 1, C))
        .repartition(64)
    )
    pairs = (
        chunks.select(F.explode("a_chunk").alias("a"), "docs")
        .select(
            "a",
            F.explode(
                F.filter("docs", lambda d: d["vec_id"] > F.col("a.vec_id"))
            ).alias("b"),
        )
    )
    cos = D._dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
    verified = pairs.filter(cos >= D.EMB_COS_THRESHOLD).select(
        F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b")
    )
    cc = D.connected_components(verified)
    assign = assigned.select("vec_id", "cent_id", "cent_sim")
    j = cc.join(
        assign, cc.doc_id == assign.vec_id
    ).select("vec_id", "cent_id", "cent_sim", "cluster_id", "cluster_size")
    w = Window.partitionBy("cluster_id").orderBy(
        F.asc("cent_sim"), F.asc("vec_id")
    )
    return j.select(
        "vec_id", "cent_id", "cent_sim", "cluster_id", "cluster_size",
        (F.row_number().over(w) == 1).alias("kept"),
    )


def timeit(spark, name, df_fn, reps=3):
    ts = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name}#{i}")
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return ts


def main():
    spark = build_session(app_name="exp_semantic_par")
    variants = {
        "prod": lambda: D.dedup_semantic(spark, SF),
        "repart64": lambda: variant_repart(spark, SF, 64),
        "chunked": lambda: chunked_first_explode(spark, SF),
    }
    # warm each once
    for n, f in variants.items():
        f().write.format("noop").mode("overwrite").save()
    out = {n: [] for n in variants}
    for rnd in range(3):  # interleave
        for n, f in variants.items():
            out[n] += timeit(spark, n, f, reps=1)
    for n, ts in out.items():
        print(n, ts, "min", min(ts))
    # equality check: prod vs variants (sorted rows)
    base = sorted(map(tuple, D.dedup_semantic(spark, SF).collect()))
    for n in ("repart64", "chunked"):
        rows = sorted(map(tuple, variants[n]().collect()))
        print(n, "rows_equal:", rows == base, len(rows), len(base))
    spark.stop()


if __name__ == "__main__":
    main()
