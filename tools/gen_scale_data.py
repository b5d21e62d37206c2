"""Deterministic ~10x (sf1-scale) synthetic tables for scale validation.

Derives documents / embeddings / events at 10x the sf0.1 row counts FROM
the sf0.1 parquet — no RNG, so every run regenerates byte-identical data:

* documents: 10 copies; copy k>0 salts every token with a copy prefix,
  so shingles never collide across copies and the near-dup graph is
  EXACTLY 10x the sf0.1 graph (linear growth by construction — a fresh
  corpus, not 10x duplication, which would square the candidate count).
* embeddings: 10 copies; copy k>0 rolls the dimensions by k — a
  norm-preserving permutation, so each copy is distributed exactly like
  the base cloud (iid components) and rolled twins are near-orthogonal;
  bucket/list occupancy then scales the honest way (10x rows -> 10x
  per bucket), not concentrated into a few buckets.
* events: 10 copies with user_id/event_id offsets — 10x the series,
  identical per-series shapes.

Usage: python tools/gen_scale_data.py [src_sf_dir] [dest_dir]
(bench.py calls ensure_sf1() automatically for its sf1 section.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = 10


def generate(spark, src_dir: str, dest_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    n_docs = docs.count()
    copies = spark.range(N_COPIES).select(F.col("id").alias("k"))
    out_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("k") * n_docs).alias("doc_id"),
            F.when(F.col("k") == 0, F.col("text")).otherwise(
                # per-copy token salt: 'c<k>q' prefix on every word —
                # no token is shared across copies
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(F.lit("c"), F.col("k").cast("string"),
                                           F.lit("q"), w),
                    ),
                    " ",
                )
            ).alias("text"),
            F.col("lang"), F.col("source"),
        )
    )
    out_docs = out_docs.withColumn("n_chars", F.length("text").cast("long"))
    out_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    out_emb = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("k") * n_emb).alias("vec_id"),
            F.when(F.col("k") == 0, F.col("embedding")).otherwise(
                # roll dims by k: element i <- element (i + k) mod dim
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.element_at(
                        "embedding",
                        ((i + F.col("k").cast("int")) % dim) + 1,
                    ),
                )
            ).alias("embedding"),
            F.col("label"),
        )
    )
    out_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest_dir, "embeddings.parquet"))

    ev = spark.read.parquet(os.path.join(src_dir, "events.parquet"))
    stats = ev.agg(F.max("user_id").alias("mu"),
                   F.max("event_id").alias("me")).first()
    u_span, e_span = int(stats["mu"]) + 1, int(stats["me"]) + 1
    out_ev = (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("k") * e_span).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.col("k") * u_span).alias("user_id"),
            F.col("event_type"), F.col("value"), F.col("props"),
        )
    )
    out_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest_dir, "events.parquet"))


def ensure_sf1(spark, src_dir: str = "/root/testdata/sf0.1",
               dest_dir: str | None = None) -> str:
    """Generate the sf1-scale dir if missing; returns its path.  The
    marker file commits completion — a half-written dir regenerates."""
    if dest_dir is None:
        dest_dir = os.environ.get(
            "SPARK_GRAFT_SCALE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".scale_sf1"),
        )
    marker = os.path.join(dest_dir, "_COMPLETE")
    if not os.path.exists(marker):
        generate(spark, src_dir, dest_dir)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


if __name__ == "__main__":
    from tslearn_spark import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("gen_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    out = ensure_sf1(spark, src, dst)
    print("sf1-scale data at", out)
    spark.stop()
