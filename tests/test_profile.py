"""Unit tests for operators/profile.py (histogram, exact grouped median,
table profiling) and text_ops.word_stats.

Medians are checked against Python's statistics.median on the collected
values — an independent in-process oracle (the DuckDB differential runs
via __spark_entry__/tools/check_correctness.py)."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.profile import (
    grouped_median_exact,
    histogram_fixed_width,
    profile_table,
)
from blueforty___etl_data_pipeline_spark.operators.text_ops import word_stats


def test_grouped_median_odd_and_even(spark):
    rows = [
        ("a", 1.00), ("a", 2.00), ("a", 10.00),          # odd: median 2.0
        ("b", 1.00), ("b", 2.00), ("b", 3.00), ("b", 4.00),  # even: 2.5
        ("c", 5.25),                                      # single row
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        r["g"]: (r["n_rows"], r["median"])
        for r in grouped_median_exact(df, ["g"], "v").collect()
    }
    assert out == {"a": (3, 2.0), "b": (4, 2.5), "c": (1, 5.25)}


def test_grouped_median_with_duplicate_values(spark):
    # Duplicates collapse into counted distinct values — the middle can
    # land inside one value's position range.
    vals = [1.0, 3.0, 3.0, 3.0, 9.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    got = grouped_median_exact(df, ["g"], "v").collect()[0]["median"]
    assert got == statistics.median(vals) == 3.0


def test_grouped_median_matches_statistics_on_sf_small(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    got = {
        r["o_orderpriority"]: r["median_price"]
        for r in grouped_median_exact(
            o, ["o_orderpriority"], "o_totalprice", alias="median_price"
        ).collect()
    }
    rows = o.select("o_orderpriority", "o_totalprice").collect()
    by_grp: dict[str, list[float]] = {}
    for r in rows:
        by_grp.setdefault(r[0], []).append(round(r[1], 2))
    for g, vals in by_grp.items():
        assert abs(got[g] - statistics.median(vals)) < 1e-9, g


def test_histogram_counts_and_edges(spark):
    df = spark.createDataFrame(
        [(0.1,), (7.9,), (8.0,), (15.99,), (16.0,), (100.0,)], ["value"]
    )
    out = {
        r["bin"]: (r["bin_lo"], r["n"])
        for r in histogram_fixed_width(df, "value", width=8.0).collect()
    }
    assert out[0] == (0.0, 2)
    assert out[1] == (8.0, 2)
    assert out[2] == (16.0, 1)
    assert out[12] == (96.0, 1)


def test_histogram_total_matches_rowcount(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    out = histogram_fixed_width(ev, "value", width=8.0)
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()


def test_profile_table_shape_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], ["k", "s"]
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s"}
    k, s = out["k"], out["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 3)
    assert (k["min_repr"], k["max_repr"]) == ("1", "3")
    assert (s["n_nulls"], s["n_distinct"]) == (1, 1)
    assert (s["min_repr"], s["max_repr"]) == ("x", "x")


def test_word_stats_basic(spark):
    df = spark.createDataFrame(
        [(1, "a b a c a"), (2, "z z y y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in word_stats(df).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_distinct"]) == (5, 3)
    assert (r1["top_word"], r1["top_cnt"]) == ("a", 3)
    assert abs(r1["ttr"] - 3 / 5) < 1e-12
    assert abs(r1["top_frac"] - 3 / 5) < 1e-12
    # tie on count: lexicographically LARGEST word wins (documented).
    r2 = out[2]
    assert (r2["top_word"], r2["top_cnt"]) == ("z", 2)


# ---------------------------------------------------------------------------
# Discrete quantiles / IQR outliers
# ---------------------------------------------------------------------------


def test_grouped_quantiles_disc_picks_rank_elements(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        grouped_quantiles_disc,
    )

    # group a: values 1..8 → n=8; p25→rank 2, p50→rank 4, p75→rank 6.
    rows = [("a", float(v)) for v in range(1, 9)]
    # group b: heavy duplication — ranks must count multiplicity.
    rows += [("b", 1.0)] * 9 + [("b", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in grouped_quantiles_disc(df, ["g"], "v").collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_rows"], a["p25"], a["p50"], a["p75"]) == (8, 2.0, 4.0, 6.0)
    # b: n=10 → p25 rank 3, p50 rank 5, p75 rank 8 — all land on 1.0.
    assert (b["n_rows"], b["p25"], b["p50"], b["p75"]) == (10, 1.0, 1.0, 1.0)


def test_grouped_quantiles_disc_returns_actual_values(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        grouped_quantiles_disc,
    )

    # Continuous doubles: the discrete quantile must be an element of
    # the group, never an interpolation.
    vals = [0.137, 2.718281828, 3.14159, 42.0001, 7.77]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    r = grouped_quantiles_disc(df, ["g"], "v").collect()[0]
    assert r["p25"] in vals and r["p50"] in vals and r["p75"] in vals


def test_iqr_outliers_flags_tails_only(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        iqr_outliers,
    )

    # 1..9 are tight; 1000 is an extreme outlier. n=10 → p25 at rank
    # ceil(2.5)=3 → 3.0, p75 at rank ceil(7.5)=8 → 8.0, IQR=5 →
    # fences [-4.5, 15.5].
    rows = [(i, "g", float(v)) for i, v in enumerate([*range(1, 10), 1000])]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = iqr_outliers(df, ["g"], "v").collect()
    assert [r["v"] for r in out] == [1000.0]
    assert out[0]["lo_fence"] == -4.5 and out[0]["hi_fence"] == 15.5
    assert set(out[0].asDict()) == {"id", "g", "v", "lo_fence", "hi_fence"}


def test_quantiles_property_based(spark):
    # Properties over random groups: each quantile is an element of its
    # group, quantiles are monotone in p, and p100 is the group max.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        grouped_quantiles_disc,
    )

    vals = st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, width=32
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=12, deadline=None)
    @given(groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), vals, min_size=1, max_size=3
    ))
    def check(groups):
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = grouped_quantiles_disc(
            df, ["g"], "v", ps=(0.25, 0.5, 0.75, 1.0)
        ).collect()
        for r in out:
            members = sorted(groups[r["g"]])
            qs = [r["p25"], r["p50"], r["p75"], r["p100"]]
            assert all(q in members for q in qs)
            assert qs == sorted(qs)          # monotone in p
            assert qs[-1] == members[-1]     # p100 = max
            assert r["n_rows"] == len(members)

    check()


def test_approx_profile_error_bounds(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import approx_profile
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    approx = {
        r["event_type"]: r
        for r in approx_profile(
            ev, group_col="event_type", distinct_col="user_id",
            quantile_col="value",
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.sort_array(F.collect_list("value")).alias("vals"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, a in approx.items():
        e = exact[k]
        assert abs(a["approx_distinct"] - e["nd"]) <= max(2, 0.05 * e["nd"])
        # percentile_approx returns an actual element whose RANK is within
        # n/accuracy of the target rank (the sketch's contract)
        vals = e["vals"]
        n = len(vals)
        tol = max(2, n // 1000)
        for got, p in zip(a["approx_quantiles"], (0.5, 0.9, 0.99)):
            assert got in vals
            idx = vals.index(got)
            assert abs(idx - p * (n - 1)) <= tol, (k, p, idx, n)


def test_zscore_normalize_exact(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        zscore_normalize,
    )

    # group g: values 1, 2, 3 → mean 2, std sqrt(2/3); singleton group
    # h has zero variance → null z
    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0), (4, "h", 5.0)],
        "event_id long, event_type string, value double",
    )
    out = {
        r["event_id"]: r["z_scaled"]
        for r in zscore_normalize(
            df, "event_type", "value", id_cols=("event_id",)
        ).collect()
    }
    import math

    std = math.sqrt(2_000_000_000_000 / 3)  # variance of millis
    assert out[1] == math.floor(-1000 / std * 1e9)
    assert out[2] == 0
    assert out[3] == math.floor(1000 / std * 1e9)
    assert out[4] is None


def test_embedding_dim_profile_fixed_point(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        embedding_dim_profile,
    )

    df = spark.createDataFrame(
        [([0.5, -0.25],), ([1.5, 0.75],)], ["embedding"]
    )
    out = {r["dim"]: r for r in embedding_dim_profile(df).collect()}
    assert out[0]["n"] == 2 and out[0]["sum_fp"] == 2_000_000
    assert (out[0]["min_fp"], out[0]["max_fp"]) == (500_000, 1_500_000)
    assert out[1]["sum_fp"] == 500_000
    assert (out[1]["min_fp"], out[1]["max_fp"]) == (-250_000, 750_000)


def test_winsorize_clamps_to_discrete_quantiles(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        winsorize,
    )

    # group g: values 1..20 → p5 = ceil(0.05·20)=1st value = 1,
    # p95 = ceil(0.95·20)=19th value = 19; group h: constant column
    rows = [("g", float(i)) for i in range(1, 21)] + [
        ("h", 7.0) for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, ["grp"], "v", p_lo=0.05, p_hi=0.95)
    got = {(r["grp"], r["v"]): r["v_wins"] for r in out.collect()}
    assert len(got) == 21  # row count preserved (dup h-rows collapse key)
    assert out.count() == 24
    assert got[("g", 1.0)] == 1.0      # at the low bound, untouched
    assert got[("g", 20.0)] == 19.0    # clamped DOWN to the p95 element
    assert got[("g", 19.0)] == 19.0
    assert got[("g", 10.0)] == 10.0
    assert got[("h", 7.0)] == 7.0      # constant group is a no-op
    # clamp bounds are actual data values: nothing outside [1, 19]
    assert all(1.0 <= v <= 19.0 for (g, _), v in got.items() if g == "g")


def test_partition_fingerprints_order_independent_and_diff(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        changed_partitions,
        partition_fingerprints,
    )

    a = spark.createDataFrame(
        [
            (1, "x", "p1"),
            (2, "y", "p1"),
            (3, "z", "p2"),   # unchanged partition
            (4, "w", "p3"),   # will be removed
        ],
        ["id", "val", "part"],
    )
    b = spark.createDataFrame(
        [
            (2, "y", "p1"),   # same rows, DIFFERENT order
            (1, "x", "p1"),
            (3, "z", "p2"),
            (5, "v", "p4"),   # added partition
        ],
        ["id", "val", "part"],
    )
    fpa = partition_fingerprints(a, "part")
    fpb = partition_fingerprints(b, "part")
    # order independence: p1 and p2 fingerprints identical across snapshots
    fa = {r["part"]: (r["n_rows"], r["fingerprint"]) for r in fpa.collect()}
    fb = {r["part"]: (r["n_rows"], r["fingerprint"]) for r in fpb.collect()}
    assert fa["p1"] == fb["p1"] and fa["p2"] == fb["p2"]

    diff = {
        r["part"]: r["status"]
        for r in changed_partitions(fpa, fpb, "part").collect()
    }
    assert diff == {"p3": "removed", "p4": "added"}

    # a value change flips the fingerprint but not the count
    b2 = spark.createDataFrame(
        [(1, "x", "p1"), (2, "CHANGED", "p1")], ["id", "val", "part"]
    )
    diff2 = {
        r["part"]: r["status"]
        for r in changed_partitions(
            fpa, partition_fingerprints(b2, "part"), "part"
        ).collect()
    }
    assert diff2["p1"] == "changed"
    # NULL vs the string 'NULL' vs '' are three distinct contents
    schema = "id long, val string, part string"
    n1 = spark.createDataFrame([(1, None, "p")], schema)
    n2 = spark.createDataFrame([(1, "NULL", "p")], schema)
    n3 = spark.createDataFrame([(1, "", "p")], schema)
    fs = [
        partition_fingerprints(x, "part").collect()[0]["fingerprint"]
        for x in (n1, n2, n3)
    ]
    assert len(set(fs)) == 3

    # r3 ADVICE (low): duplicate rows must NOT cancel.  Under the old
    # XOR fold, {A, A} and {B, B} both fingerprinted to 0 with equal
    # n_rows, so a real change classified as unchanged.  The multiset
    # SUM keeps them distinct.
    da = spark.createDataFrame(
        [(1, "x", "p"), (1, "x", "p")], ["id", "val", "part"]
    )
    db = spark.createDataFrame(
        [(2, "y", "p"), (2, "y", "p")], ["id", "val", "part"]
    )
    fp_a = partition_fingerprints(da, "part")
    fp_b = partition_fingerprints(db, "part")
    assert (
        fp_a.collect()[0]["fingerprint"]
        != fp_b.collect()[0]["fingerprint"]
    )
    dup_diff = {
        r["part"]: r["status"]
        for r in changed_partitions(fp_a, fp_b, "part").collect()
    }
    assert dup_diff == {"p": "changed"}


def test_mad_outliers_hand_case_and_degenerate(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mad_outliers,
    )

    # group "a": 1..7 plus 100 -> median 4.5, MAD 2.0; threshold
    # 3*1.4826*2 = 8.8956, so only the 100 flags.
    # group "b": four identical values plus one other -> MAD 0 (the
    # classic degenerate), so ANY nonzero deviation flags.
    rows = [("a", float(v)) for v in range(1, 8)] + [
        ("a", 100.0),
        ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outliers(df, ["g"], "v").collect()
    flagged = {(r["g"], r["v"], r["median"], r["mad"]) for r in out}
    assert flagged == {("a", 100.0, 4.5, 2.0), ("b", 9.0, 5.0, 0.0)}


def test_heavy_hitters_exact_under_scrambled_partitioning(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        heavy_hitters,
    )

    # 300/1000 occurrences of "hh" among 700 unique fillers; k=5 means
    # the gate is freq > 200, so exactly {"hh": 300} must survive —
    # regardless of how rows are scattered across partitions (the MG
    # candidate pass must not lose it; the recount must be exact).
    rows = [("hh",)] * 300 + [(f"u{i}",) for i in range(700)]
    df = spark.createDataFrame(rows, "w string").repartition(7)
    out = {
        (r["w"], r["n_rows"], r["share_permille"])
        for r in heavy_hitters(df, "w", k=5).collect()
    }
    assert out == {("hh", 300, 300)}
    # no value crosses 1/2 of the stream -> empty result
    assert heavy_hitters(df, "w", k=2).count() == 0


def test_heavy_hitters_non_string_column(spark):
    # The candidate frame's mapInPandas schema is derived from the
    # input column's type, so bigint keys (the typical heavy-hitter
    # input) round-trip through Arrow and join back type-correctly.
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        heavy_hitters,
    )

    rows = [(42,)] * 300 + [(1000 + i,) for i in range(700)]
    df = spark.createDataFrame(rows, "k long").repartition(7)
    out = {
        (r["k"], r["n_rows"], r["share_permille"])
        for r in heavy_hitters(df, "k", k=5).collect()
    }
    assert out == {(42, 300, 300)}
    dtypes = dict(heavy_hitters(df, "k", k=5).dtypes)
    assert dtypes["k"] == "bigint"


def test_fk_containment_clean_partial_and_null(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        fk_containment,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    r = fk_containment(child, "k", parent, "k").collect()[0]
    # distinct non-null child values {1,2,3}; matched {1,2} -> 666 permille
    assert (
        r["n_child_distinct"], r["n_matched"], r["containment_permille"]
    ) == (3, 2, 666)


def test_mad_outliers_randomized_vs_python_reference(spark):
    import random

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mad_outliers,
    )

    def ref_flags(vals, k_x14826=44478):
        cents = [round(v * 100) for v in vals]

        def med2(xs):
            s = sorted(xs)
            n = len(s)
            return s[(n + 1) // 2 - 1] + s[n // 2]

        m2 = med2(cents)
        dev2 = [abs(2 * c - m2) for c in cents]
        mad4 = med2(dev2)
        return {
            i
            for i, d2 in enumerate(dev2)
            if d2 * 20000 > mad4 * k_x14826
        }

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        # two-decimal values with a heavy tail
        vals = [round(rng.expovariate(0.1), 2) for _ in range(200)]
        want = ref_flags(vals)
        rows = [(i, "g", v) for i, v in enumerate(vals)]
        got = {
            r["i"]
            for r in mad_outliers(
                spark.createDataFrame(rows, "i long, g string, v double"),
                ["g"],
                "v",
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_schema_drift_add_remove_retype(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        schema_drift,
    )

    old = spark.createDataFrame([(1, "x", 2.0)], "a long, b string, c double")
    new = spark.createDataFrame([(1, 5, True)], "a long, b long, d boolean")
    out = {
        r["column"]: (r["status"], r["old_type"], r["new_type"])
        for r in schema_drift(old, new).collect()
    }
    assert out == {
        "b": ("type_changed", "string", "bigint"),
        "c": ("removed", "double", None),
        "d": ("added", None, "boolean"),
    }


def test_quantile_bins_equi_depth(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        quantile_bins,
    )

    # values 1..8 in one group: quartile boundaries at 2, 4, 6 ->
    # exactly two rows per bin; boundary values bin LOW
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 9)], "g string, v double"
    )
    out = {
        r["v"]: r["bin"]
        for r in quantile_bins(df, ["g"], "v").collect()
    }
    assert out == {
        1.0: 1, 2.0: 1, 3.0: 2, 4.0: 2, 5.0: 3, 6.0: 3, 7.0: 4, 8.0: 4,
    }


def test_row_diff_classifies_all_statuses(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        row_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, "NULL")],
        "k long, v string",
    )
    out = {r["k"]: r["status"] for r in row_diff(old, new, ["k"]).collect()}
    # 1 untouched (absent), 2 changed, 3 removed, 5 added,
    # 4: NULL -> 'NULL' must register as changed (sentinel != literal)
    assert out == {2: "changed", 3: "removed", 5: "added", 4: "changed"}


def test_pareto_front_matches_bruteforce(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        pareto_front_2d,
    )

    # deterministic pseudo-random points incl. x-ties and full-ties
    pts = [(i, (i * 37) % 13, (i * 53) % 11) for i in range(60)]
    pts.append((100, pts[0][1], pts[0][2]))  # exact duplicate point
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r["id"] for r in pareto_front_2d(df, "x", "y", id_col="id").collect()
    }
    expect = set()
    for i, x, y in pts:
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for _, x2, y2 in pts
        )
        if not dominated:
            expect.add(i)
    assert got == expect and expect


def test_pareto_front_excludes_null_objectives(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        pareto_front_2d,
    )

    df = spark.createDataFrame(
        [(1, 1, 5), (2, None, 99), (3, 0, None)],
        "id long, x long, y long",
    )
    out = [r["id"] for r in pareto_front_2d(df, "x", "y", id_col="id").collect()]
    assert out == [1]


def test_gini_concentration_extremes_and_formula(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        gini_concentration,
    )

    rows = (
        [("even", 10)] * 4                    # perfectly even -> 0
        + [("one", 0), ("one", 0), ("one", 0), ("one", 100)]  # max skew
        + [("mix", 1), ("mix", 2), ("mix", 3)]
        + [("zero", 0)]                       # undefined -> dropped
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: (r["gini_permille"], r["n_rows"], r["total"])
        for r in gini_concentration(df, ["g"], "v").collect()
    }
    assert out["even"] == (0, 4, 40)
    # one owner of everything among n=4: gini = (n-1)/n = 0.75
    assert out["one"] == (750, 4, 100)
    # sorted 1,2,3: (2*(1+4+9) - 4*6)/(3*6) = 4/18 = 0.2222 -> 222
    assert out["mix"] == (222, 3, 6)
    assert "zero" not in out


def test_corr_matrix_exact_known_values(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        corr_matrix,
    )

    # y = 2x (perfect positive), z = -x (perfect negative),
    # w constant (undefined -> NULL)
    rows = [(float(x), 2.0 * x, -1.0 * x, 5.0) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    out = {
        (r["col_a"], r["col_b"]): r["corr_e6"]
        for r in corr_matrix(df, ["x", "y", "z", "w"]).collect()
    }
    assert out[("x", "y")] == 1_000_000
    # floor(-1.0 * 1e6) can land at -1000000 exactly (integers exact)
    assert out[("x", "z")] == -1_000_000
    assert out[("y", "z")] == -1_000_000
    assert out[("x", "w")] is None
    n = corr_matrix(df, ["x", "y"]).collect()[0]["n"]
    assert n == 8


def test_corr_matrix_requires_two_cols(spark):
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        corr_matrix,
    )

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        corr_matrix(df, ["x"])


def test_jackknife_mean_matches_closed_form(spark):
    """On equal folds of a known population, the delete-d jackknife
    SE must track the classical SE = sigma/sqrt(n) closely, the point
    estimate must be exact, and the fold table must be mergeable
    (union of two halves == whole)."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        jackknife_mean,
    )

    rows = [(i, float(100 + (i * 37) % 200)) for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = jackknife_mean(df, "v", "k", folds=20, scale=100).collect()[0]
    assert r["n"] == 4000 and r["n_folds"] == 20

    import statistics

    vals = [v for _, v in rows]
    mean = statistics.fmean(vals)
    assert abs(r["mean_e6"] / 1e6 - mean) < 0.01
    se = statistics.pstdev(vals) / (len(vals) ** 0.5)
    # jackknife SE is a consistent estimator; on a balanced synthetic
    # population it should land within ~25% of the closed form
    assert abs(r["se_e6"] / 1e6 - se) / se < 0.25

    # determinism: same input, same answer
    r2 = jackknife_mean(df, "v", "k", folds=20, scale=100).collect()[0]
    assert tuple(r) == tuple(r2)


def test_permutation_test_detects_and_rejects(spark):
    """Power + calibration anchors: a huge real group difference is
    flagged significant (no permutation beats it -> p = 1/(B+1));
    identical groups are insignificant (p well above 0.05); the
    add-one correction keeps p > 0."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        permutation_test,
    )

    strong = [(i, "a", 1000.0 + (i % 7)) for i in range(300)] + [
        (i + 1000, "b", 2000.0 + (i % 7)) for i in range(300)
    ]
    df = spark.createDataFrame(strong, ["k", "g", "v"])
    r = permutation_test(
        df, "v", "g", "k", "a", "b", n_perm=32
    ).collect()[0]
    assert r["n_a"] == 300 and r["n_b"] == 300
    assert r["diff_e6"] < 0  # a-mean minus b-mean is -1000
    assert r["n_extreme"] == 0
    assert r["p_e6"] == 1000000 // 33  # 1/(B+1), floored e6

    null = [(i, "a" if i % 2 == 0 else "b", float(i % 50)) for i in range(600)]
    r2 = permutation_test(
        spark.createDataFrame(null, ["k", "g", "v"]),
        "v", "g", "k", "a", "b", n_perm=32,
    ).collect()[0]
    assert r2["p_e6"] > 50000  # nowhere near significant
    assert r2["n_extreme"] > 0


def test_spearman_ground_truths(spark):
    """Anchors: any strictly monotone transform gives exactly +1e6
    (the point of rank correlation), reversal gives -1e6, and the
    tie-averaged textbook case matches scipy-style closed form."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        spearman_corr,
    )

    mono = [(float(i), float(i * i * i + 5)) for i in range(1, 40)]
    r = spearman_corr(
        spark.createDataFrame(mono, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert (r["n"], r["spearman_e6"]) == (39, 1000000)

    rev = [(float(i), float(100 - i)) for i in range(1, 40)]
    r2 = spearman_corr(
        spark.createDataFrame(rev, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r2["spearman_e6"] == -1000000

    # ties: x = [1,2,2,3], y = [10,20,20,40] -> still perfectly
    # concordant with identical tie structure -> +1
    ties = [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)]
    r3 = spearman_corr(
        spark.createDataFrame(ties, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r3["spearman_e6"] == 1000000

    # constant column: zero rank variance -> NULL
    const = [(1.0, float(i)) for i in range(10)]
    r4 = spearman_corr(
        spark.createDataFrame(const, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r4["spearman_e6"] is None


def test_mann_whitney_ground_truths(spark):
    """Anchors against the closed form: complete separation gives
    U = na*nb (u2 = 2*na*nb) with large positive z; identical
    distributions give u2 near its null mean and |z| small; the
    statistic matches a hand-computed small example with ties."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mann_whitney_u,
    )

    sep = [("a", float(100 + i)) for i in range(20)] + [
        ("b", float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(sep, ["g", "v"])
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (20, 20)
    assert r["u2"] == 2 * 20 * 20  # every a beats every b
    assert r["z_e6"] > 5_000_000  # z > 5

    same = [("a", float(i % 10)) for i in range(50)] + [
        ("b", float(i % 10)) for i in range(50)
    ]
    r2 = mann_whitney_u(
        spark.createDataFrame(same, ["g", "v"]), "v", "g", "a", "b"
    ).collect()[0]
    assert r2["u2"] == 2 * 50 * 50 // 2  # exactly the null mean
    assert abs(r2["z_e6"]) < 100_000

    # hand example: a = [1, 3], b = [2, 2]
    # pooled sorted: 1(a) 2(b) 2(b) 3(a); avg ranks: 1, 2.5, 2.5, 4
    # R_a = 1 + 4 = 5 -> U = 5 - 2*3/2 = 2 -> u2 = 4
    hand = [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0)]
    r3 = mann_whitney_u(
        spark.createDataFrame(hand, ["g", "v"]), "v", "g", "a", "b"
    ).collect()[0]
    assert r3["u2"] == 4


def test_ks_two_sample_ground_truths(spark):
    """Anchors: disjoint supports give D = 1e6 exactly; identical
    samples give D = 0; a half-shifted example matches the
    hand-computed CDF gap."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        ks_two_sample,
    )

    disjoint = [("a", float(i)) for i in range(10)] + [
        ("b", float(100 + i)) for i in range(10)
    ]
    r = ks_two_sample(
        spark.createDataFrame(disjoint, ["g", "v"]), "v", "g", "a", "b"
    ).collect()[0]
    assert r["d_e6"] == 1000000

    same = [("a", float(i % 5)) for i in range(20)] + [
        ("b", float(i % 5)) for i in range(20)
    ]
    r2 = ks_two_sample(
        spark.createDataFrame(same, ["g", "v"]), "v", "g", "a", "b"
    ).collect()[0]
    assert r2["d_e6"] == 0
    assert r2["crit_ks_e6"] > 0

    # a = {1,2,3,4}, b = {3,4,5,6}: max gap at v=2: F_a=.5, F_b=0
    half = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    r3 = ks_two_sample(
        spark.createDataFrame(half, ["g", "v"]), "v", "g", "a", "b"
    ).collect()[0]
    assert r3["d_e6"] == 500000


def test_target_encode_smoothing_and_loo(spark):
    """Smoothing anchors: an m-sample prior pulls a rare category
    toward the global mean while a huge category barely moves; LOO
    excludes each row's own label and falls back to the global mean
    for singletons."""
    from blueforty___etl_data_pipeline_spark.operators.aggregate import (
        target_encode,
    )

    rows = (
        [("big", 100.0)] * 200
        + [("rare", 900.0)] * 2
        + [("solo", 500.0)]
    )
    df = spark.createDataFrame(rows, ["c", "y"])
    glob_mean = (200 * 100 + 2 * 900 + 500) / 203

    enc = {
        r["c"]: r
        for r in target_encode(df, "c", "y", smoothing=20).collect()
    }
    assert abs(enc["big"]["enc_e6"] / 1e6 - 100) < 10  # barely moves
    rare = enc["rare"]["enc_e6"] / 1e6
    # rare shrinks most of the way to the global mean
    assert glob_mean < rare < 900
    assert rare - glob_mean < 0.15 * (900 - glob_mean)

    loo = target_encode(
        df, "c", "y", smoothing=20, leave_one_out=True
    ).collect()
    by_cat = {}
    for r in loo:
        by_cat.setdefault(r["c"], []).append(r["enc_e6"] / 1e6)
    # big: each row's LOO mean is still 100 (identical targets)
    assert all(abs(v - 100) < 1e-6 for v in by_cat["big"])
    # rare pair: each row sees only the OTHER row -> exactly 900
    assert all(abs(v - 900) < 1e-6 for v in by_cat["rare"])
    # singleton: falls back to the global mean
    assert abs(by_cat["solo"][0] - glob_mean) < 0.01


def test_ols_fit_exact_recovery_and_gates(spark):
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ols_fit,
    )

    # y = 7 + 3*x1 - 2*x2 exactly -> coefficients recovered exactly
    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(6)
        for x2 in range(5)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    got = ols_fit(df, "y", ["x1", "x2"]).collect()[0]
    assert got["n"] == 30
    assert got["beta_intercept_e6"] == 7_000_000
    assert got["beta_x1_e6"] == 3_000_000
    assert got["beta_x2_e6"] == -2_000_000

    # floor semantics for a negative non-integer coefficient:
    # y = -x/2 over x in {0,1,2,3} -> slope -0.5 -> floor(-500000.?)
    df2 = spark.createDataFrame(
        [(0, 0), (1, -1), (2, -1), (3, -2)], "x long, y long"
    )
    r = ols_fit(df2, "y", ["x"]).collect()[0]
    assert r["beta_x_e6"] == -600_000  # exact Cramer: slope -3/5

    # single-feature simple regression agrees with closed form
    df3 = spark.createDataFrame(
        [(i, 10 * i + 1) for i in range(10)], "x long, y long"
    )
    r3 = ols_fit(df3, "y", ["x"]).collect()[0]
    assert r3["beta_x_e6"] == 10_000_000
    assert r3["beta_intercept_e6"] == 1_000_000

    # degenerate design (constant feature collinear with intercept)
    dfc = spark.createDataFrame([(5, 1), (5, 2)], "x long, y long")
    with pytest.raises(ValueError, match="singular"):
        ols_fit(dfc, "y", ["x"])


def test_kendall_tau_known_values(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        kendall_tau,
    )

    # perfectly monotone, no ties -> tau = 1
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "x long, y long"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["n"] == 8 and r["tau_b_e6"] == 1_000_000
    assert r["n_concordant"] == 28 and r["n_discordant"] == 0

    # perfectly reversed -> tau = -1
    df = spark.createDataFrame(
        [(i, -i) for i in range(8)], "x long, y long"
    )
    assert (
        kendall_tau(df, "x", "y").collect()[0]["tau_b_e6"] == -1_000_000
    )

    # tied data, cross-checked against the closed form:
    # x = [1,1,2,2,3], y = [1,2,1,2,3]
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3)], "x long, y long"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    c, d, tx, ty = 5, 1, 2, 2  # hand count
    expect = math.floor(
        1_000_000.0 * (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    )
    assert (r["n_concordant"], r["n_discordant"]) == (c, d)
    assert r["tau_b_e6"] == expect


def test_gini_gain_perfect_vs_useless_feature(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        gini_gain,
    )

    # label perfectly determined by f_good; f_bad is constant
    rows = [(lab, lab, "k") for lab in ["a"] * 6 + ["b"] * 6]
    df = spark.createDataFrame(rows, "y string, f_good string, f_bad string")
    got = {r["feature"]: r for r in gini_gain(df, "y", ["f_good", "f_bad"]).collect()}
    # root gini of a 50/50 split = 0.5
    assert got["f_good"]["gini_root_e6"] == 500_000
    # perfect split -> child purity 1, split gini 0, gain = root
    assert got["f_good"]["gini_split_e6"] == 0
    assert got["f_good"]["gain_e6"] == 500_000
    # constant feature -> no information
    assert got["f_bad"]["gini_split_e6"] == 500_000
    assert got["f_bad"]["gain_e6"] == 0
    assert got["f_good"]["n_values"] == 2 and got["f_bad"]["n_values"] == 1

    # ordering: best gain first
    ordered = [r["feature"] for r in gini_gain(df, "y", ["f_bad", "f_good"]).collect()]
    assert ordered == ["f_good", "f_bad"]


def test_calibration_report_exact_bins_and_ece(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        calibration_report,
    )

    # bin 0: preds 50000/50000, labels 1,0 -> mean 50000, obs 500000
    # bin 9: preds 950000 & 1000000 (clamped into bin 9), labels 1,1
    rows = [
        (50_000, True), (50_000, False),
        (950_000, True), (1_000_000, True),
    ]
    df = spark.createDataFrame(rows, "pred_e6 long, y boolean")
    got = {r["bin"]: r for r in calibration_report(df, "pred_e6", "y").collect()}
    assert set(got) == {0, 9}
    assert got[0]["mean_pred_e6"] == 50_000
    assert got[0]["obs_rate_e6"] == 500_000
    assert got[0]["gap_e6"] == 450_000
    assert got[9]["mean_pred_e6"] == 975_000
    assert got[9]["obs_rate_e6"] == 1_000_000
    assert got[9]["gap_e6"] == 25_000
    # ECE = (2*450000 + 2*25000) // 4, same on every row
    assert {r["ece_e6"] for r in got.values()} == {237_500}


def test_mahalanobis_outliers_joint_vs_marginal(spark):
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mahalanobis_outliers,
    )

    # tight x=y cloud plus one point INSIDE both marginal ranges but
    # far off the joint diagonal — only the covariance-aware distance
    # flags it
    cloud = [(i, i + (1 if i % 2 else -1)) for i in range(200)]
    rows = cloud + [(30, 170)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = mahalanobis_outliers(df, "x", "y").collect()[0]
    assert r["n"] == 201
    assert r["n_outliers"] == 1
    # the anti-diagonal point dominates every cloud member's distance
    assert r["max_d2_e3"] > 100 * 1000

    # the flagged point is within BOTH marginal ranges (sanity: a
    # z-score screen at 3 sigma would NOT flag x=30 or y=170 here)
    xs = [x for x, _ in rows]
    ys = [y for _, y in rows]
    assert min(xs) <= 30 <= max(xs) and min(ys) <= 170 <= max(ys)

    # degenerate gates
    with pytest.raises(ValueError, match="degenerate"):
        mahalanobis_outliers(
            spark.createDataFrame([(1, 1), (2, 2)], "x long, y long"),
            "x", "y",
        )  # perfectly collinear
    with pytest.raises(ValueError, match="degenerate"):
        mahalanobis_outliers(
            spark.createDataFrame([(5, 1), (5, 2)], "x long, y long"),
            "x", "y",
        )  # constant column


def test_mahalanobis_outliers_decimal_budget_raises(spark):
    """Moment magnitudes that would overflow decimal(38,0) in the
    per-row quadratic must raise up front (non-ANSI overflow would
    silently NULL the scores and report 0 outliers), with the rescale
    factor in the message."""
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mahalanobis_outliers,
    )

    v = 10**9
    rows = [(0, 0), (v, v // 2), (v // 2, v), (v // 3, v // 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    with pytest.raises(ValueError, match="pre-divide"):
        mahalanobis_outliers(df, "x", "y", auto_rescale=False)


def test_mahalanobis_outliers_auto_rescale_engages(spark):
    """Over-budget moments with the default auto_rescale must re-run
    on integer-divided inputs instead of raising (round-11 scale
    gate), and the result must equal manually pre-divided inputs —
    the rule the old error message prescribed.  Mahalanobis d² is
    scale-invariant, so the rescaled screen is the same screen up to
    the inputs' floor-quantization."""
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mahalanobis_outliers,
    )

    v = 10**9
    rows = [(0, 0), (v, v // 2), (v // 2, v), (v // 3, v // 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = mahalanobis_outliers(df, "x", "y").collect()[0]
    manual_rows = [(a // 10, b // 10) for a, b in rows]
    manual = spark.createDataFrame(manual_rows, "x long, y long")
    want = mahalanobis_outliers(
        manual, "x", "y", auto_rescale=False
    ).collect()[0]
    assert got.asDict() == want.asDict()
    assert got["n"] == 4


def test_join_skew_report_exact_cardinality(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.profile import (
        join_skew_report,
    )

    left = spark.createDataFrame(
        [(k,) for k in [1] * 5 + [2] * 3 + [3] * 1 + [4] * 2],
        "k long",
    )
    right = spark.createDataFrame(
        [(k,) for k in [1] * 4 + [2] * 2 + [3] * 7 + [9] * 3],
        "k long",
    )
    rows = join_skew_report(left, right, "k", top=2).collect()
    # exact join cardinality without running the join
    true_n = left.join(right, "k").count()
    assert rows[0]["total_rows"] == true_n == 5 * 4 + 3 * 2 + 1 * 7
    assert rows[0]["n_join_keys"] == 3  # keys 1,2,3 (4 and 9 no match)
    assert [(r["k"], r["contrib"]) for r in rows] == [(1, 20), (3, 7)]
    assert rows[0]["permille"] == 20 * 1000 // 33


def test_kaplan_meier_textbook_example(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        kaplan_meier,
    )

    # classic toy: deaths at t=1 (1 of 5), t=3 (1 of 3);
    # censored at t=2 and t=3; survivor to t=4
    rows = [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0)]
    df = spark.createDataFrame(rows, "duration int, event int")
    got = {
        r["duration"]: (
            r["n_risk"], r["n_events"], r["n_censored"],
            r["survival_e6"],
        )
        for r in kaplan_meier(df, "duration", "event").collect()
    }
    # S(1) = 4/5 = .8; S(3) = .8 * (1 - 1/3) = .533333...
    assert got[1] == (5, 1, 0, 800000)
    assert got[2] == (4, 0, 1, 800000)      # censoring leaves S flat
    assert got[3] == (3, 1, 1, 533333)
    assert got[4] == (1, 0, 1, 533333)


def test_woe_encode_matches_hand_computation(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.aggregate import (
        woe_encode,
    )

    rows = (
        [("a", True)] * 8 + [("a", False)] * 2
        + [("b", True)] * 1 + [("b", False)] * 9
        + [("c", True)] * 5 + [("c", False)] * 5
    )
    df = spark.createDataFrame(rows, "cat string, y boolean")
    out = {r["cat"]: r for r in woe_encode(df, "cat", "y").collect()}
    pos_t, neg_t, k, a = 14, 16, 3, 0.5
    for cat, pos_c, neg_c in [("a", 8, 2), ("b", 1, 9), ("c", 5, 5)]:
        p_pos = (pos_c + a) / (pos_t + a * k)
        p_neg = (neg_c + a) / (neg_t + a * k)
        woe = math.log(p_pos / p_neg)
        r = out[cat]
        assert (r["n_pos"], r["n_neg"]) == (pos_c, neg_c)
        assert r["woe_e6"] == math.floor(1e6 * woe)
        assert r["iv_e9"] == math.floor(1e9 * ((p_pos - p_neg) * woe))
    # positive-heavy category has positive WoE, negative-heavy negative
    assert out["a"]["woe_e6"] > 0 > out["b"]["woe_e6"]


def test_grouped_mode_ties_to_smallest(spark):
    from blueforty___etl_data_pipeline_spark.operators.aggregate import (
        grouped_mode,
    )

    rows = [
        (1, "b"), (1, "b"), (1, "a"),           # clear winner b
        (2, "z"), (2, "y"),                      # tie -> smallest (y)
        (3, "q"),                                # singleton
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    got = {
        r["k"]: (r["mode_value"], r["mode_count"])
        for r in grouped_mode(df, "k", "v").collect()
    }
    assert got == {1: ("b", 2), 2: ("y", 1), 3: ("q", 1)}


def test_fd_check_holds_and_violations(spark):
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        fd_check,
    )

    rows = [
        (1, "x", 10), (2, "x", 10), (3, "y", 20), (3, "y", 20),
        (4, "y", 21),  # y maps to both 20 and 21 -> b->c violated
    ]
    df = spark.createDataFrame(rows, "a long, b string, c long")
    out = {(r["lhs"], r["rhs"]): r for r in
           fd_check(df, [("a", "b"), ("b", "c"), ("c", "b")]).collect()}
    assert out[("a", "b")]["holds"] is True        # each a one b
    assert out[("b", "c")]["holds"] is False
    assert out[("b", "c")]["n_violations"] == 1    # y -> {20, 21}
    assert out[("c", "b")]["holds"] is True        # each c one b
    assert out[("a", "b")]["n_lhs"] == 4


def test_global_fits_raise_on_empty_input(spark):
    # Round-14 zero-row audit contract: a degenerate fit RAISES
    # (empty input == constant feature == collinear design — there is
    # nothing to fit, and a NULL coefficient row would silently
    # poison downstream consumers).
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ols_fit,
    )
    from blueforty___etl_data_pipeline_spark.operators.profile import (
        mahalanobis_outliers,
    )

    empty = spark.createDataFrame([], "rid long, x long, y long")
    with pytest.raises(ValueError, match="empty"):
        ols_fit(empty, "y", ["x"])
    with pytest.raises(ValueError, match="empty"):
        mahalanobis_outliers(empty, "x", "y")
