"""Deterministic sampling / split / quota semantics
(operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.sampling import (
    hash_sample,
    hash_split,
    quota_cap,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
    )


def test_hash_sample_is_deterministic_and_near_fraction(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    assert a == b  # same rows every run
    assert 0.15 < len(a) / 400 < 0.35  # near the requested fraction


def test_hash_sample_salt_decorrelates(spark):
    df = _docs(spark)
    a = set(r["doc_id"] for r in hash_sample(df, 0.5, salt="s1").collect())
    b = set(r["doc_id"] for r in hash_sample(df, 0.5, salt="s2").collect())
    assert a != b  # different salts → different (overlapping) subsets


def test_hash_split_partitions_every_row_once(spark):
    df = _docs(spark)
    out = hash_split(df)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 400
    assert counts.get("train", 0) > 300  # 98% nominal
    # A row's split is a pure function of its id: stable across calls.
    s1 = {r["doc_id"]: r["split"] for r in out.collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert s1 == s2


def test_hash_split_custom_weights_cover_all_labels(spark):
    out = hash_split(_docs(spark), weights={"a": 1, "b": 1})
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels == {"a", "b"}


def test_quota_cap_caps_each_group(spark):
    df = _docs(spark)  # 4 sources × 100 docs
    out = quota_cap(df, group_col="source", n=10)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    # Deterministic subset, not "first 10 by id".
    kept = sorted(r["doc_id"] for r in out.filter(F.col("source") == "0").collect())
    kept2 = sorted(
        r["doc_id"]
        for r in quota_cap(df, group_col="source", n=10)
        .filter(F.col("source") == "0")
        .collect()
    )
    assert kept == kept2
    assert kept != list(range(0, 40, 4))[:10]


def test_quota_cap_leaves_small_groups_whole(spark):
    df = _docs(spark, n=20)  # 4 sources × 5 docs
    assert quota_cap(df, group_col="source", n=10).count() == 20


def test_stratified_sample_per_stratum_rates(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "lang", fractions={"en": 0.5, "fr": 0.05}
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per stratum; hash sampling is exact-in-expectation.
    assert 400 <= counts.get("en", 0) <= 600
    assert 20 <= counts.get("fr", 0) <= 90
    # Deterministic: the same call yields the same rows.
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, "lang", fractions={"en": 0.5, "fr": 0.05}
        ).collect()
    )


def test_stratified_sample_default_fraction_drops_unlisted(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "de") for i in range(100)], "doc_id long, lang string"
    )
    assert stratified_sample(df, "lang", fractions={"en": 1.0}).count() == 0
    assert (
        stratified_sample(
            df, "lang", fractions={"en": 1.0}, default_fraction=1.0
        ).count()
        == 100
    )
