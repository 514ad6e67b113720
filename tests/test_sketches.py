"""Mergeable-sketch operators: Count-Min frequency and KMV distinct.

The load-bearing claims at 100 TB are (a) the one-sided Count-Min
guarantee, (b) exactness below the sketch capacity, and (c) the merge
law — union of inputs == merge of sketches — which is what lets daily
sketches roll up without touching raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.sketches import (
    HASH_SPACE,
    count_min_build,
    count_min_estimate,
    kmv_distinct,
)


def _df(spark, vals, col="k"):
    return spark.createDataFrame([(v,) for v in vals], [col])


def test_cms_never_underestimates_and_catches_heavy_keys(spark):
    vals = [1] * 500 + [2] * 100 + list(range(3, 203))
    df = _df(spark, vals)
    sketch = count_min_build(df, "k", width=64, depth=4)
    probes = _df(spark, [1, 2, 3, 999])
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sketch, probes, "k", width=64, depth=4
        ).collect()
    }
    assert est[1] >= 500 and est[2] >= 100 and est[3] >= 1
    # collision noise is bounded by the residual mass / width per row,
    # and the min over 4 independent rows keeps the heavy key tight
    assert est[1] < 500 + len(vals)
    # an absent key can only pick up collision mass, never real count
    assert 0 <= est[999] <= len(vals)


def test_cms_merge_law(spark):
    a = _df(spark, [1, 1, 2, 3])
    b = _df(spark, [1, 4, 4, 5])
    merged_input = count_min_build(a.union(b), "k", width=32, depth=3)
    merged_sketch = (
        count_min_build(a, "k", width=32, depth=3)
        .union(count_min_build(b, "k", width=32, depth=3))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert as_rows(merged_input) == as_rows(merged_sketch)


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([(1, 10), (1, 5), (2, 7)], ["k", "w"])
    sketch = count_min_build(df, "k", width=32, depth=2, weight_col="w")
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sketch, _df(spark, [1, 2]), "k", width=32, depth=2
        ).collect()
    }
    assert est[1] >= 15 and est[2] >= 7


def test_kmv_exact_below_capacity(spark):
    df = _df(spark, list(range(10)) * 3)  # 10 distinct, repeated
    row = kmv_distinct(df, "k", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10  # sketch holds the full set


def test_kmv_estimate_accuracy_and_grouping(spark):
    n = 5000
    rows = [(("even" if v % 2 == 0 else "odd"), v) for v in range(n)]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = {
        r["g"]: r
        for r in kmv_distinct(
            df, "k", k=128, group_cols=["g"]
        ).collect()
    }
    for g in ("even", "odd"):
        r = out[g]
        assert r["n_kept"] == 128
        assert 0 < r["kth_min"] < HASH_SPACE
        # KMV std error ~ 1/sqrt(k) ≈ 8.8%; allow 4 sigma
        assert abs(r["est_distinct"] - n // 2) < 0.35 * (n // 2)


def test_kmv_merge_is_min_union(spark):
    """Merging two KMV sketches = union their hash sets, re-take the
    k smallest — identical to sketching the unioned input."""
    a = _df(spark, range(0, 400))
    b = _df(spark, range(200, 600))
    direct = kmv_distinct(a.union(b), "k", k=32).collect()[0]
    merged = kmv_distinct(
        a.select("k").union(b.select("k")), "k", k=32
    ).collect()[0]
    assert tuple(direct) == tuple(merged)


def test_sketch_plans_stay_jvm_side(spark):
    """No Python row UDFs and no cartesian product in either sketch
    plan; the probe join broadcasts the sketch side."""
    df = _df(spark, range(100))
    sketch = count_min_build(df, "k", width=64, depth=4)
    est = count_min_estimate(
        sketch, _df(spark, [1, 2, 3]), "k", width=64, depth=4
    )
    for frame in (sketch, est, kmv_distinct(df, "k", k=16)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_bloom_semi_join_no_false_negatives(spark):
    from blueforty___etl_data_pipeline_spark.operators.sketches import (
        bloom_semi_join,
    )

    fact = spark.createDataFrame(
        [(i % 50,) for i in range(500)], "k long"
    )
    dim = spark.createDataFrame([(i,) for i in range(0, 50, 5)], "k long")
    r = bloom_semi_join(fact, dim, key_col="k").collect()[0]
    assert r["n_fact_keys"] == 50
    assert r["n_true_keys"] == 10
    # no false negatives: kept ⊇ true
    assert r["n_kept_keys"] >= r["n_true_keys"]
    assert r["n_false_positive"] == r["n_kept_keys"] - r["n_true_keys"]
    # 10 keys × 3 hashes in 64Ki bits → FP probability ≈ 9e-14 per key;
    # any FP here means the hash chain broke
    assert r["n_false_positive"] == 0

    # tiny filter forces false positives but never negatives
    r2 = bloom_semi_join(fact, dim, key_col="k", n_bits=16, n_hashes=2)
    row2 = r2.collect()[0]
    assert row2["n_kept_keys"] >= row2["n_true_keys"]
    assert row2["n_false_positive"] > 0  # 40 non-members vs 16 bits


def test_kmv_overlap_identical_disjoint_and_exact_small(spark):
    from blueforty___etl_data_pipeline_spark.operators.sketches import (
        kmv_overlap,
    )

    rows = (
        [("x", i) for i in range(40)]
        + [("y", i) for i in range(40)]          # y identical to x
        + [("z", 1000 + i) for i in range(40)]   # z disjoint
    )
    df = spark.createDataFrame(rows, "grp string, k long")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_overlap(df, "grp", "k", k=64).collect()
    }
    # sub-k sketches are exact: identical sets -> jaccard 1000 and
    # exact union; disjoint -> 0, union = 80
    assert got[("x", "y")]["jaccard_permille_est"] == 1000
    assert got[("x", "y")]["union_est"] == 40
    assert got[("x", "y")]["intersection_est"] == 40
    assert got[("x", "z")]["jaccard_permille_est"] == 0
    assert got[("x", "z")]["union_est"] == 80
    assert got[("y", "z")]["intersection_est"] == 0
