"""Derive a 10x scale-stress replica ("sf1") of the driver's sf0.1
fixtures under the repo scratch dir.

The driver ships sf{0.001,0.01,0.1} only; the documented scale shapes
(LSH banding, shingle-join bounds, watermarked streaming state,
iterative loops) need an empirical check at a scale where fixed
session costs stop dominating.  This tool unions 10 key-shifted
copies of every scaling table — NOT a new synthetic dataset: every
value is derived from the driver's own fixtures, and the copy is used
ONLY by the spot bench (tools/bench_sf1_spot.py), never by the
correctness gate.

Replication rules (keep workload shapes realistic at 10x):

- region/nation: fixed dimensions, copied as-is (TPC-H convention).
- customer/supplier/part/orders/lineitem: surrogate keys shift by
  copy*stride with FK consistency (orders.o_custkey moves with its
  customer copy, lineitem moves with its order/part/supplier copies),
  so join fan-outs stay constant while join input volume grows 10x.
- events: event_id/user_id shift; timestamps stay -> 10x event rate
  per window, which stresses watermark state exactly like a 10x
  traffic site would.
- documents: doc_id shifts; for copies >0 every token gets a
  copy-digit suffix, so copies are textually DISSIMILAR — a naive
  text copy would make every doc a 10-way near-duplicate and turn
  the shingle joins into an artificial quadratic fixture.  n_chars
  is recomputed.
- embeddings: vec_id shifts; for copies >0 the vector is rotated by
  `copy` dimensions — norms and value distributions are preserved
  but cosine structure is not, so ANN/SemDeDup candidate volumes
  scale like a real 10x corpus instead of collapsing into 10-way
  exact-duplicate clusters.

Usage: python tools/make_sf1.py [out_dir]   (default .tmp/sf1)
"""

from __future__ import annotations

import os

# Long single-JVM sweeps need the 16g heap (VERDICT r12 #1); the
# library default is 4g, so sweep entry points scope the bump here.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# stride per key column = max over the table it's a key OF (FK columns
# must use the parent table's stride so references stay aligned)
STRIDE_OF = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    out_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".tmp", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    strides = {}
    for t, pk in PK.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        strides[t] = int(df.agg(F.max(pk)).collect()[0][0]) + 1

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: copied")

    for t, keys in KEY_SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = src
            for k in keys:
                c = c.withColumn(
                    k,
                    (F.col(k) + F.lit(i * strides[STRIDE_OF[k]])).cast(
                        dict(src.dtypes)[k]
                    ),
                )
            if t == "documents" and i > 0:
                c = c.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S+)", rf"$1{i}"),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and i > 0:
                dim = len(src.select("embedding").first()[0])
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(sequence(0, {dim - 1}), "
                        f"j -> embedding[(j + {i}) % {dim}])"
                    ),
                )
            parts.append(c)
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        un.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
