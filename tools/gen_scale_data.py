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


def _gen_documents(spark, src_dir: str, dest_dir: str,
                   n_copies: int = N_COPIES) -> None:
    """documents at n_copies x the source rows, per-copy token-salted
    (no token shared across copies, so inverted-index candidate counts
    stay linear by construction)."""
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    n_docs = docs.count()
    copies = spark.range(n_copies).select(F.col("id").alias("k"))
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


def generate(spark, src_dir: str, dest_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)

    _gen_documents(spark, src_dir, dest_dir, N_COPIES)
    _gen_embeddings(spark, src_dir, dest_dir, N_COPIES)
    _gen_events(spark, src_dir, dest_dir, N_COPIES)


def _gen_embeddings(spark, src_dir: str, dest_dir: str,
                    n_copies: int = N_COPIES) -> None:
    """embeddings at n_copies x the source rows; copy k rolls the
    dimensions by k so cross-copy collisions stay at zero.  Requires
    n_copies <= dim (64 here) for the rolls to stay distinct."""
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)
    copies = spark.range(n_copies).select(F.col("id").alias("k"))
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    if n_copies > dim:
        raise ValueError(f"n_copies={n_copies} > dim={dim}: rolled "
                         "copies would repeat")
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


def _gen_events(spark, src_dir: str, dest_dir: str,
                n_copies: int = N_COPIES) -> None:
    """events at n_copies x the source rows: copies shift
    user_id/event_id by the source spans, values/timestamps untouched —
    n_copies x the series population with identical per-series shapes."""
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)
    copies = spark.range(n_copies).select(F.col("id").alias("k"))
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


def generate_tpch(spark, src_dir: str, dest_dir: str,
                  n_copies: int = N_COPIES) -> None:
    """Derive the n_copies-x TPC-H-ish star schema (r12; parameterized
    r14 for the sf5 grain): fact/entity tables are replicated with
    key-space offsets that PRESERVE referential integrity
    (orders.o_custkey shifts by the same stride as customer.c_custkey,
    lineitem FKs shift with orders/part/supplier);
    the tiny dimension tables (region, nation) stay fixed like real
    TPC-H does at any SF.  Name columns are salted per copy so rows stay
    globally unique (top-k tie-breaks that involve names keep working);
    measure columns, dates and category domains (mktsegment, brand,
    priority...) are untouched, so per-group aggregates scale 10x the
    honest way.  Deterministic — no RNG anywhere."""
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)
    copies = spark.range(n_copies).select(F.col("id").alias("k"))

    def salt(col):
        return F.when(F.col("k") == 0, F.col(col)).otherwise(
            F.concat(F.lit("c"), F.col("k").cast("string"), F.lit("_"),
                     F.col(col)))

    def stride_of(df, key):
        return int(df.agg(F.max(key)).first()[0]) + 1

    for name in ("region", "nation"):
        spark.read.parquet(os.path.join(src_dir, f"{name}.parquet")) \
            .write.mode("overwrite").parquet(
                os.path.join(dest_dir, f"{name}.parquet"))

    cust = spark.read.parquet(os.path.join(src_dir, "customer.parquet"))
    supp = spark.read.parquet(os.path.join(src_dir, "supplier.parquet"))
    part = spark.read.parquet(os.path.join(src_dir, "part.parquet"))
    orders = spark.read.parquet(os.path.join(src_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(src_dir, "lineitem.parquet"))
    cs, ss, ps, os_ = (stride_of(cust, "c_custkey"),
                       stride_of(supp, "s_suppkey"),
                       stride_of(part, "p_partkey"),
                       stride_of(orders, "o_orderkey"))

    (cust.crossJoin(F.broadcast(copies))
     .select((F.col("c_custkey") + F.col("k") * cs).alias("c_custkey"),
             salt("c_name").alias("c_name"), "c_nationkey", "c_acctbal",
             "c_mktsegment")
     .repartition(16).write.mode("overwrite")
     .parquet(os.path.join(dest_dir, "customer.parquet")))
    (supp.crossJoin(F.broadcast(copies))
     .select((F.col("s_suppkey") + F.col("k") * ss).alias("s_suppkey"),
             salt("s_name").alias("s_name"), "s_nationkey", "s_acctbal")
     .repartition(8).write.mode("overwrite")
     .parquet(os.path.join(dest_dir, "supplier.parquet")))
    (part.crossJoin(F.broadcast(copies))
     .select((F.col("p_partkey") + F.col("k") * ps).alias("p_partkey"),
             salt("p_name").alias("p_name"), "p_brand", "p_type", "p_size",
             "p_retailprice")
     .repartition(16).write.mode("overwrite")
     .parquet(os.path.join(dest_dir, "part.parquet")))
    (orders.crossJoin(F.broadcast(copies))
     .select((F.col("o_orderkey") + F.col("k") * os_).alias("o_orderkey"),
             (F.col("o_custkey") + F.col("k") * cs).alias("o_custkey"),
             "o_orderstatus", "o_totalprice", "o_orderdate",
             "o_orderpriority")
     .repartition(32).write.mode("overwrite")
     .parquet(os.path.join(dest_dir, "orders.parquet")))
    (li.crossJoin(F.broadcast(copies))
     .select((F.col("l_orderkey") + F.col("k") * os_).alias("l_orderkey"),
             (F.col("l_partkey") + F.col("k") * ps).alias("l_partkey"),
             (F.col("l_suppkey") + F.col("k") * ss).alias("l_suppkey"),
             "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
             "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
     .repartition(64).write.mode("overwrite")
     .parquet(os.path.join(dest_dir, "lineitem.parquet")))


def ensure_sf1_tpch(spark, src_dir: str = "/root/testdata/sf0.1",
                    dest_dir: str | None = None) -> str:
    """Generate the 10x TPC-H tables into the scale dir if missing —
    with these plus ensure_sf1's documents/embeddings/events, the
    FULL oracle roster can run at sf1 (tools/check_oracles.py)."""
    if dest_dir is None:
        dest_dir = os.environ.get(
            "SPARK_GRAFT_SCALE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".scale_sf1"),
        )
    marker = os.path.join(dest_dir, "_COMPLETE_TPCH")
    if not os.path.exists(marker):
        generate_tpch(spark, src_dir, dest_dir)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


# -- clustered embedding corpus (ANN recall measurement) --------------------
# The sf1 embeddings derived above inherit the synthetic base's
# near-uniform geometry, where top-10 neighbors are barely closer than
# the bulk and hyperplane-LSH recall has an intrinsic ~0 floor — numbers
# measured there say nothing about real corpora.  Real embedding spaces
# are clustered (that is why IVF/LSH work at all), so the recall bench
# also gets a deterministic Gaussian-mixture corpus: N_CLUSTERED rows in
# CLUSTER_DIM dims around CLUSTER_K unit-scale centroids with sigma
# CLUSTER_SIGMA noise — same generator pattern as the clustered fixtures
# in tests/test_pipeline.py, at bench scale.
N_CLUSTERED = 100_000
CLUSTER_K = 200
CLUSTER_DIM = 64
CLUSTER_SIGMA = 0.3
CLUSTER_SEED = 20260815


def generate_clustered(spark, dest_dir: str) -> str:
    """Write embeddings_clustered.parquet: (vec_id, embedding, label)
    with label = mixture component.  Deterministic: centroids from one
    seeded RandomState; per-row noise from a RandomState seeded by
    (CLUSTER_SEED ^ vec_id), so the output is independent of partitioning."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rs = np.random.RandomState(CLUSTER_SEED)
    centroids = rs.randn(CLUSTER_K, CLUSTER_DIM)
    bc = spark.sparkContext.broadcast(centroids)

    def gen(batches):
        cen = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lab = (ids % CLUSTER_K).astype(np.int32)
            out = np.empty((len(ids), CLUSTER_DIM), dtype=np.float64)
            for i, vid in enumerate(ids):
                r = np.random.RandomState((CLUSTER_SEED ^ int(vid)) % (2**31))
                out[i] = cen[lab[i]] + CLUSTER_SIGMA * r.randn(CLUSTER_DIM)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(out.astype(np.float32)),
                "label": lab,
            })

    path = os.path.join(dest_dir, "embeddings_clustered.parquet")
    (
        spark.range(0, N_CLUSTERED, 1, 32)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .write.mode("overwrite").parquet(path)
    )
    return path


def ensure_sf1_clustered(spark, dest_dir: str | None = None) -> str:
    """Generate the clustered recall corpus if missing; returns the
    parquet path.  Lives in the same scale dir as the sf1 tables with
    its own completion marker."""
    if dest_dir is None:
        dest_dir = os.environ.get(
            "SPARK_GRAFT_SCALE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".scale_sf1"),
        )
    os.makedirs(dest_dir, exist_ok=True)
    marker = os.path.join(dest_dir, "_COMPLETE_CLUSTERED")
    path = os.path.join(dest_dir, "embeddings_clustered.parquet")
    if not os.path.exists(marker):
        generate_clustered(spark, dest_dir)
        with open(marker, "w") as f:
            f.write("ok\n")
    return path


def ensure_sf5_documents(spark, src_dir: str = "/root/testdata/sf0.1",
                         dest_dir: str | None = None,
                         n_copies: int = 50) -> str:
    """documents-only dir at 50x sf0.1 rows (5x the sf1 documents) for
    the bench sf5 linear-slope mini-section: one genuinely big single
    pass that catches accidental O(n log n) shuffles the sf0.1 -> sf1
    step is too short to expose.  Only documents is derived — the three
    cheapest linear ops (dedup_exact, text_quality, dedup_simhash) read
    nothing else, and load_tables tolerates the missing tables."""
    if dest_dir is None:
        dest_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale_sf5")
    marker = os.path.join(dest_dir, "_COMPLETE_DOCS")
    if not os.path.exists(marker):
        _gen_documents(spark, src_dir, dest_dir, n_copies)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


def ensure_sf5_events(spark, src_dir: str = "/root/testdata/sf0.1",
                      dest_dir: str | None = None,
                      n_copies: int = 50) -> str:
    """events at 50x sf0.1 rows (5M events / 75000 series; 5x the sf1
    table) for the sf5 board's events-grain gates.  Same marker-commit
    protocol as ensure_sf5_documents."""
    if dest_dir is None:
        dest_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale_sf5")
    marker = os.path.join(dest_dir, "_COMPLETE_EVENTS")
    if not os.path.exists(marker):
        _gen_events(spark, src_dir, dest_dir, n_copies)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


def ensure_sf5_embeddings(spark, src_dir: str = "/root/testdata/sf0.1",
                          dest_dir: str | None = None,
                          n_copies: int = 50) -> str:
    """embeddings at 50x sf0.1 rows (100k 64-dim vectors; 5x sf1) for
    the sf5 board's ANN/embedding gates."""
    if dest_dir is None:
        dest_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale_sf5")
    marker = os.path.join(dest_dir, "_COMPLETE_EMBEDDINGS")
    if not os.path.exists(marker):
        _gen_embeddings(spark, src_dir, dest_dir, n_copies)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


def ensure_sf5_tpch(spark, src_dir: str = "/root/testdata/sf0.1",
                    dest_dir: str | None = None,
                    n_copies: int = 50) -> str:
    """TPC-H grain at 50x sf0.1 (30M lineitem / 7.5M orders / 750k
    customer — 5x the sf1 tables) so the relational passthrough family
    (q1/q3/q5/top_customers/part_brand/nation_rollup/orders_priority/
    revenue_grouping_sets) and events_asof_orders get >sf1 hash gates
    (VERDICT r13 directive 3: the one query family with no evidence
    past sf1).  Same RI-preserving copy protocol and marker-commit as
    ensure_sf1_tpch."""
    if dest_dir is None:
        dest_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale_sf5")
    marker = os.path.join(dest_dir, "_COMPLETE_TPCH")
    if not os.path.exists(marker):
        generate_tpch(spark, src_dir, dest_dir, n_copies)
        with open(marker, "w") as f:
            f.write("ok\n")
    return dest_dir


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
