"""Data-quality constraint checking (operators/constraints.py)."""

from __future__ import annotations

import pytest

from blueforty___etl_data_pipeline_spark.operators.constraints import (
    constraint_violations,
)


def _viol(df, **kw):
    return {
        r["rule"]: r["n_violations"]
        for r in constraint_violations(df, **kw).collect()
    }


def test_scalar_rules_fuse_and_count(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "F"),     # range violation
            (None, 20.0, "X"),  # null key + bad status
            (3, 999.0, "O"),    # range violation
            (3, 15.0, None),    # duplicate key; null status not counted
        ],
        "k long, v double, s string",
    )
    out = _viol(
        df,
        not_null=["k"],
        unique=[["k"]],
        in_range={"v": (0.0, 100.0)},
        accepted_values={"s": ["O", "F"]},
    )
    assert out == {
        "not_null:k": 1,
        # 5 rows, distinct key tuples {1,2,NULL,3} = 4 → 1 excess row.
        "unique:k": 1,
        "in_range:v": 2,
        "accepted_values:s": 1,
    }


def test_foreign_key_anti_join(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "oid long, cust int"
    )
    cust = spark.createDataFrame([(10,), (20,)], "cid int")
    out = _viol(orders, foreign_keys=[(["cust"], cust, ["cid"])])
    # cust=99 dangles; the NULL key row is not an FK violation.
    assert out == {"foreign_key:cust->cid": 1}


def test_composite_unique_counts_null_tuples(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (1, 2), (2, 3)], "a int, b int"
    )
    out = _viol(df, unique=[["a", "b"]])
    # (1,NULL) appears twice: the tuple participates as a value.
    assert out == {"unique:a,b": 1}


def test_no_rules_raises(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        constraint_violations(df)


def test_single_aggregate_for_scalar_rules(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    plan = (
        constraint_violations(
            df, not_null=["k"], in_range={"v": (0.0, 1.0)}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # No join, no union of scans — one scan feeds one aggregate.
    assert "Join" not in plan and "Union" not in plan


def test_k_anonymity_flags_small_classes_and_counts_null_as_value(spark):
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        k_anonymity,
    )

    rows = (
        [("us", "a")] * 5          # passes at k=5
        + [("us", "b")] * 2        # deficit 3
        + [("de", None)] * 4       # NULL is a value; deficit 1
        + [("fr", "a")]            # deficit 4
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    out = {
        (r["country"], r["seg"]): (r["class_size"], r["deficit"])
        for r in k_anonymity(df, ["country", "seg"], k=5).collect()
    }
    assert out == {
        ("us", "b"): (2, 3),
        ("de", None): (4, 1),
        ("fr", "a"): (1, 4),
    }
    # generalizing away the segment column makes the audit pass for us/fr?
    # us: 7 rows, de: 4 (still deficient), fr: 1
    gen = {
        r["country"]: r["deficit"]
        for r in k_anonymity(df, ["country"], k=5).collect()
    }
    assert gen == {"de": 1, "fr": 4}
    with pytest.raises(ValueError):
        k_anonymity(df, ["country"], k=1)


def test_benford_audit_digits_and_expectations(spark):
    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        benford_audit,
    )

    # values chosen so integer-cents first digits are unambiguous:
    # 1.23 -> 123 -> 1; 0.02 -> 2 -> 2; 9.99 -> 999 -> 9;
    # non-positive and zero-cents rows are excluded
    rows = [(1.23,), (0.02,), (9.99,), (1.0,), (-5.0,), (0.0,), (0.001,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n"] == 2 and out[1]["obs_permille"] == 500
    assert out[1]["exp_permille"] == 301
    assert out[1]["dev_permille"] == 199
    assert out[2]["n"] == 1 and out[9]["n"] == 1
    assert out[9]["exp_permille"] == 45


def test_l_diversity_flags_homogeneous_classes(spark):
    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        l_diversity,
    )

    df = spark.createDataFrame(
        [
            # class A: 3 rows, 1 distinct sensitive -> violates ell=2
            ("A", 1, "s1"),
            ("A", 1, "s1"),
            ("A", 1, "s1"),
            # class B: 2 distinct -> passes ell=2
            ("B", 1, "s1"),
            ("B", 1, "s2"),
            # class C: one non-null + null -> null counts as a value
            ("C", 1, "s1"),
            ("C", 1, None),
        ],
        "q1 string, q2 int, s string",
    )
    out = {
        (r["q1"], r["q2"]): (r["class_size"], r["n_sensitive"], r["deficit"])
        for r in l_diversity(df, ["q1", "q2"], "s", ell=2).collect()
    }
    assert out == {("A", 1): (3, 1, 1)}
    # ell=3 additionally flags B and C (null counted: C has 2 values)
    out3 = {
        (r["q1"], r["q2"]): r["n_sensitive"]
        for r in l_diversity(df, ["q1", "q2"], "s", ell=3).collect()
    }
    assert out3 == {("A", 1): 1, ("B", 1): 2, ("C", 1): 2}


def test_l_diversity_rejects_trivial_ell(spark):
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        l_diversity,
    )

    df = spark.createDataFrame([("a", 1)], "q string, s int")
    with _pytest.raises(ValueError):
        l_diversity(df, ["q"], "s", ell=1)


def test_k_anonymize_minimal_generalization(spark):
    """Records in big fine-grained groups stay at level 0; rare
    combinations climb exactly as far as needed; a singleton in a
    singleton source suppresses fully; row count is preserved."""
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        k_anonymize,
    )

    rows = (
        # 6 identical fine-grained rows -> level 0 at k=5
        [(i, "web", "en", 150) for i in range(6)]
        # 3 rows whose fine bucket is rare but coarse bucket (en,
        # chars//1000 == 0) pools with the 6 above -> level 1
        + [(10 + i, "web", "en", 450 + i) for i in range(3)]
        # rare lang in a big source -> (source, *, *) level 2
        + [(20, "web", "xx", 99999)]
        # singleton source -> full suppression
        + [(30, "lone", "en", 100)]
    )
    df = spark.createDataFrame(
        rows, ["doc_id", "source", "lang", "n_chars"]
    )
    ladder = [
        [F.col("source"), F.col("lang"), F.expr("n_chars div 100")],
        [F.col("source"), F.col("lang"), F.expr("n_chars div 1000")],
        [F.col("source"), F.lit("*"), F.lit("*")],
    ]
    out = {r["doc_id"]: r for r in k_anonymize(df, ladder, k=5).collect()}
    assert len(out) == len(rows)  # row count preserved
    for i in range(6):
        assert out[i]["anon_level"] == 0
        assert (out[i]["g0"], out[i]["g1"], out[i]["g2"]) == (
            "web", "en", "1",
        )
    for i in range(10, 13):
        assert out[i]["anon_level"] == 1
        assert out[i]["g2"] == "0"  # coarse bucket
    assert out[20]["anon_level"] == 2
    assert (out[20]["g1"], out[20]["g2"]) == ("*", "*")
    assert out[30]["anon_level"] == 3
    assert (out[30]["g0"], out[30]["g1"], out[30]["g2"]) == (
        "*", "*", "*",
    )


def test_t_closeness_emd_flags_skewed_class(spark):
    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        t_closeness,
    )

    # two equal-size classes are always symmetric (global = their sum,
    # so |cum_c·N − cum_all·g| is identical for complements) — three
    # classes break the tie: a/b uniform over bins 0..3, c concentrated
    # in bin 3.  Global cum = [2,4,6,12], N = 12, m = 4.
    uni = [(g, v) for g in ("a", "b") for v in (0, 1500, 2500, 3500)]
    conc = [("c", v) for v in (3000, 3200, 3500, 3900)]
    df = spark.createDataFrame(uni + conc, "grp string, val long")
    got = {
        r["grp"]: (r["class_size"], r["emd_permille"], r["violates"])
        for r in t_closeness(
            df, ["grp"], "val", bin_width=1000, t_permille=200
        ).collect()
    }
    # a: cum [1,2,3,4] → Σ|cum·12 − cum_all·4| = 4+8+12+0 = 24 →
    # 1000·24 // (3·4·12) = 166; c: cum [0,0,0,4] → 8+16+24 = 48 → 333
    assert got["a"] == (4, 166, False)
    assert got["b"] == (4, 166, False)
    assert got["c"] == (4, 333, True)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_width"):
        t_closeness(df, ["grp"], "val", bin_width=0)


def test_constraint_violations_zero_on_empty_relation(spark):
    # Zero-row audit (round 14): SUM-backed rules must report 0 on an
    # empty relation, never NULL — `NULL > 0` is false, so a NULL
    # count slips through every audit gate (the WAP release gate
    # published an unaudited version before this fix).
    from blueforty___etl_data_pipeline_spark.operators.constraints import (
        constraint_violations,
    )

    empty = spark.createDataFrame([], "k long, v long, s string")
    got = {
        r["rule"]: r["n_violations"]
        for r in constraint_violations(
            empty,
            not_null=("k",),
            unique=(("k",),),
            in_range={"v": (0, 10)},
            accepted_values={"s": ("a", "b")},
        ).collect()
    }
    assert got == {
        "not_null:k": 0,
        "unique:k": 0,
        "in_range:v": 0,
        "accepted_values:s": 0,
    }
