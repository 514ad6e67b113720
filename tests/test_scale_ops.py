"""Scale-toolbox operators: salted joins, write-time bucketing,
embedding near-dup blocking."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from blueforty___etl_data_pipeline_spark.operators.skew import (
    key_histogram,
    salted_join,
)
from blueforty___etl_data_pipeline_spark.sinks import write_bucketed
from blueforty___etl_data_pipeline_spark.sources.catalog import load_table


def test_salted_join_equals_plain_join(spark):
    # Power-law fact: one hot key with most rows.
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 12)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 12)], "k long, attr string"
    )
    plain = fact.join(dim, on="k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, on="k", salt=8).select(
        "k", "payload", "attr"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(100)], "k long, p long")
    dim = spark.createDataFrame([(1, "d")], "k long, a string")
    from blueforty___etl_data_pipeline_spark.operators.skew import SALT_COL

    salts = (
        fact.withColumn(SALT_COL, (F.rand(seed=42) * 8).cast("int"))
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert salts > 4  # the hot key really does fan out over salt buckets
    assert salted_join(fact, dim, on="k", salt=8).count() == 100


def test_key_histogram_orders_by_weight(spark):
    df = spark.createDataFrame(
        [(1,)] * 50 + [(2,)] * 10 + [(3,)], "k long"
    )
    rows = key_histogram(df, "k", top=2).collect()
    assert [(r["k"], r["n_rows"]) for r in rows] == [(1, 50), (2, 10)]


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    # (managed tables land in the default spark-warehouse dir —
    # warehouse.dir is a static conf and cannot be pointed at tmp_path)
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
    write_bucketed(o, "b_orders", ["l_orderkey"], num_buckets=8)
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"), on="l_orderkey"
    )
    # Both sides bucketed identically → SortMergeJoin with NO Exchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == load_table(spark, sf_small, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_embedding_near_dup_precision(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3)
    rows = pairs.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["score"] >= 0.3  # precision is exact
        assert r["id_a"] < r["id_b"]
