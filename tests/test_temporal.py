"""As-of and range joins (temporal operators Spark lacks natively)."""

from __future__ import annotations

import datetime

from blueforty___etl_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
)

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows, schema="user_id long, ts timestamp, event_id long"):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_match_and_null(spark):
    left = _df(
        spark,
        [(1, T0, 100), (1, T0 + datetime.timedelta(hours=2), 101), (2, T0, 200)],
    )
    right = _df(
        spark,
        [
            (1, T0 - datetime.timedelta(minutes=30), 900),
            (1, T0 + datetime.timedelta(hours=1), 901),
        ],
    )
    out = {
        r["event_id"]: r["asof_ts_us"]
        for r in asof_join(left, right, by=["user_id"]).collect()
    }
    us = lambda dt: int(dt.timestamp() * 1_000_000)
    assert out[100] == us(T0 - datetime.timedelta(minutes=30))
    assert out[101] == us(T0 + datetime.timedelta(hours=1))  # most recent
    assert out[200] is None  # user 2 has no right rows


def test_asof_equal_timestamp_matches(spark):
    left = _df(spark, [(1, T0, 1)])
    right = _df(spark, [(1, T0, 9)])
    out = asof_join(left, right, by=["user_id"]).collect()[0]
    assert out["asof_ts_us"] == int(T0.timestamp() * 1_000_000)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _df(spark, [(1, T0, 1)])
    right = _df(spark, [(1, T0 - datetime.timedelta(hours=3), 9)])
    out = asof_join(
        left, right, by=["user_id"], tolerance_us=3_600_000_000
    ).collect()[0]
    assert out["asof_ts_us"] is None  # match exists but is too old


def test_range_join_window_boundaries(spark):
    left = _df(spark, [(1, T0, 1)])
    mins = lambda m: T0 - datetime.timedelta(minutes=m)
    right = _df(
        spark,
        [
            (1, mins(0), 90),   # at upper bound → in
            (1, mins(10), 91),  # at lower bound → in
            (1, mins(11), 92),  # just outside → out
            (1, mins(-1), 93),  # after left → out
            (2, mins(5), 94),   # wrong key → out
        ],
    )
    pairs = range_join(
        left, right, by=["user_id"], lower_us=-600_000_000, upper_us=0
    )
    matched = sorted(r["r_event_id"] for r in pairs.collect())
    assert matched == [90, 91]


def test_range_join_matches_never_duplicated(spark):
    # the left side explodes to two candidate buckets; a right row's
    # bucket equals exactly one of them, so each pair appears once.
    left = _df(spark, [(1, T0 + datetime.timedelta(seconds=s), s) for s in range(20)])
    right = _df(spark, [(1, T0, 7)])
    pairs = range_join(
        left, right, by=["user_id"], lower_us=-60_000_000, upper_us=0
    )
    assert pairs.count() == pairs.dropDuplicates(["event_id", "r_event_id"]).count()
    assert pairs.count() == 20  # every left row sees the single right row


def test_asof_right_payload_preserves_types(spark):
    left = _df(spark, [(1, T0, 1)])
    right = spark.createDataFrame(
        [(1, T0 - datetime.timedelta(minutes=5), 3.25, "tag")],
        "user_id long, ts timestamp, price double, label string",
    )
    out = asof_join(
        left, right, by=["user_id"], right_cols=["price", "label"]
    ).collect()[0]
    assert out["asof_price"] == 3.25 and isinstance(out["asof_price"], float)
    assert out["asof_label"] == "tag"


# ---------------------------------------------------------------------------
# resample_ffill / scd2_history
# ---------------------------------------------------------------------------


def test_resample_ffill_fills_gaps_with_last_value(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        resample_ffill,
    )

    t = lambda h, m=0: datetime(2026, 1, 1, h, m)
    df = spark.createDataFrame(
        [
            ("a", t(1, 30), 10.0),
            ("a", t(4, 15), 40.0),   # hours 2,3 are gaps
            ("b", t(2), 7.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        (r["k"], r["bucket_ts"].hour): r["v"]
        for r in resample_ffill(df, ["k"], "ts", ["v"]).collect()
    }
    assert out == {
        ("a", 1): 10.0,
        ("a", 2): 10.0,  # carried forward
        ("a", 3): 10.0,  # carried forward
        ("a", 4): 40.0,
        ("b", 2): 7.0,   # single-point key: one spine row
    }


def test_resample_ffill_last_obs_in_bucket_wins(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        resample_ffill,
    )

    df = spark.createDataFrame(
        [
            ("a", datetime(2026, 1, 1, 1, 5), 1.0),
            ("a", datetime(2026, 1, 1, 1, 55), 2.0),  # later in same hour
        ],
        "k string, ts timestamp, v double",
    )
    rows = resample_ffill(df, ["k"], "ts", ["v"]).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0


def test_scd2_history_versions_and_intervals(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        scd2_history,
    )

    t = lambda d: datetime(2026, 1, d)
    df = spark.createDataFrame(
        [
            (1, t(1), "bronze"),
            (1, t(5), "bronze"),  # unchanged restatement → collapsed
            (1, t(9), "gold"),
            (2, t(3), "silver"),
        ],
        "k long, ts timestamp, tier string",
    )
    rows = sorted(
        scd2_history(df, ["k"], "ts", ["tier"]).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    assert [
        (r["k"], r["tier"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None)
        for r in rows
    ] == [
        (1, "bronze", 1, 9),   # restatement on day 5 did NOT open a version
        (1, "gold", 9, None),  # current version: open interval
        (2, "silver", 3, None),
    ]


def test_interval_concurrency_sweep_line(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        interval_concurrency,
    )

    # key "a": [0,10), [5,15), [9,12) -> 3 concurrent first at t=9;
    # half-open semantics: [0,5) and [5,8) never overlap (close before
    # open at t=5) -> key "b" peaks at 1, first at t=0.
    df = spark.createDataFrame(
        [
            ("a", 0, 10),
            ("a", 5, 15),
            ("a", 9, 12),
            ("b", 0, 5),
            ("b", 5, 8),
        ],
        "k string, s long, e long",
    )
    out = {
        r["k"]: (r["max_concurrent"], r["first_peak"])
        for r in interval_concurrency(
            df, start_col="s", end_col="e", key_col="k"
        ).collect()
    }
    assert out == {"a": (3, 9), "b": (1, 0)}


def test_seasonality_profile_integer_buckets(spark):
    from datetime import datetime, timezone

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        seasonality_profile,
    )

    # 1970-01-01 was a Thursday (dow 4 with Sunday=0); 1970-01-04 was
    # a Sunday (dow 0).
    rows = [
        (datetime(1970, 1, 1, 5, 30, tzinfo=timezone.utc),),
        (datetime(1970, 1, 1, 5, 45, tzinfo=timezone.utc),),
        (datetime(1970, 1, 4, 23, 0, tzinfo=timezone.utc),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {
        (r["dow"], r["hour"]): (r["n_events"], r["share_permille"])
        for r in seasonality_profile(df).collect()
    }
    assert out == {(4, 5): (2, 666), (0, 23): (1, 333)}


def test_bucketed_packs_randomized_vs_python_sim(spark):
    import random

    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        bucketed_packs,
    )

    def p2ceil(n):
        if n <= 1:
            return n
        return 1 << (n - 1).bit_length()

    for seed in (0, 1):
        rng = random.Random(seed)
        docs = [
            (i, " ".join("w" * 1 for _ in range(rng.randint(1, 40))))
            for i in range(60)
        ]
        budget = 50
        # python reference: per power-of-two bucket, id-ordered prefix sum
        want = {}
        cums = {}
        for i, text in sorted(docs):
            n = len(text.split())
            b = p2ceil(n)
            before = cums.get(b, 0)
            want[i] = (n, b, before // budget)
            cums[b] = before + n
        got = {
            r["doc_id"]: (r["n_tokens"], r["bucket"], r["pack_id"])
            for r in bucketed_packs(
                spark.createDataFrame(docs, "doc_id long, text string")
                .repartition(5),
                budget=budget,
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_time_weighted_avg_hand_computed(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        time_weighted_avg,
    )

    def t(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        # group g: 10 held for 2s, 20 held for 1s, 40 ends the span
        ("g", t(0), 10.0),
        ("g", t(2), 20.0),
        ("g", t(3), 40.0),
        # lone: single observation -> no span -> dropped
        ("lone", t(0), 99.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["k"]: (r["twap_micros"], r["span_us"], r["n_obs"])
        for r in time_weighted_avg(df, ["k"]).collect()
    }
    # twap = (10*2 + 20*1) / 3 = 13.333...; floor micros
    assert out == {"g": (13_333_333, 3_000_000, 3)}


def test_time_weighted_avg_differs_from_plain_avg(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        time_weighted_avg,
    )

    # value spikes briefly: plain AVG = 50.5, TWAP stays near the base
    rows = [
        ("k", datetime(2026, 1, 1, 0, 0, 0), 1.0),
        ("k", datetime(2026, 1, 1, 0, 0, 59), 100.0),
        ("k", datetime(2026, 1, 1, 0, 1, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    [r] = time_weighted_avg(df, ["k"]).collect()
    # (1*59s + 100*1s)/60s = 2.65
    assert r["twap_micros"] == 2_650_000


def test_ohlc_bars_hand_computed_with_ties(spark):
    from datetime import datetime, timedelta

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        ohlc_bars,
    )

    def t(m, s=0):
        return datetime(2026, 1, 1) + timedelta(minutes=m, seconds=s)

    rows = [
        ("k", t(1), 5.0),
        ("k", t(10), 9.0),
        ("k", t(10), 2.0),   # same-instant tie: lower value is "earlier"
        ("k", t(50), 7.0),
        ("k", t(65), 3.0),   # next hour bucket
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["bucket_start_us"]: (
            r["open_micros"], r["high_micros"], r["low_micros"],
            r["close_micros"], r["n_obs"],
        )
        for r in ohlc_bars(df, ["k"], bucket_minutes=60).collect()
    }
    h0 = 1767225600000000  # 2026-01-01 00:00 UTC in micros
    assert out[h0] == (5_000_000, 9_000_000, 2_000_000, 7_000_000, 4)
    assert out[h0 + 3_600_000_000] == (
        3_000_000, 3_000_000, 3_000_000, 3_000_000, 1
    )


def test_cusum_shift_detects_level_change(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        cusum_shift,
    )

    # 4 days at 2 events/day then 4 days at 10/day: CUSUM |S| peaks at
    # the last low-level day (day index 3)
    rows = []
    eid = 0
    for d in range(8):
        n = 2 if d < 4 else 10
        for i in range(n):
            rows.append((eid, d * 86400 + i * 60))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, sec long").select(
        "event_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = sorted(
        cusum_shift(df, ts_col="ts", bucket="day").collect(),
        key=lambda r: r["bucket_start_us"],
    )
    assert [r["n_events"] for r in out] == [2, 2, 2, 2, 10, 10, 10, 10]
    total, n_days = 48, 8
    # S_k = n*cumsum_k - k*T, exact integers
    cums = [2, 4, 6, 8, 18, 28, 38, 48]
    expect = [n_days * c - (k + 1) * total for k, c in enumerate(cums)]
    assert [r["cusum_scaled"] for r in out] == expect
    peaks = [i for i, r in enumerate(out) if r["is_peak"]]
    assert peaks == [3]


def test_ab_proportion_test_hand_computed(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ab_proportion_test,
    )

    # variant 0: 60/100 convert; variant 1: 40/100 convert
    rows = [(0, 1)] * 60 + [(0, 0)] * 40 + [(1, 1)] * 40 + [(1, 0)] * 60
    df = spark.createDataFrame(rows, "variant int, converted int")
    r = ab_proportion_test(df, "variant", "converted").collect()
    assert len(r) == 1
    r = r[0]
    assert (r["variant_a"], r["variant_b"]) == (0, 1)
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 60, 100, 40)
    p = 0.5
    z = (0.6 - 0.4) / math.sqrt(p * (1 - p) * (2 / 100))
    assert r["z_e6"] == math.floor(z * 1_000_000)
    assert r["significant"]  # z ~ 2.83


def test_ab_proportion_test_requires_two_variants(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ab_proportion_test,
    )

    df = spark.createDataFrame([(0, 1)] * 5, "variant int, converted int")
    assert ab_proportion_test(df, "variant", "converted").count() == 0


def test_acf_alternating_and_periodic_series(spark):
    """ACF ground truths: a strict alternation has r_1 = -1 and
    r_2 = +1 (up to the finite-sample end effect), a period-4 cycle
    peaks at lag 4, and a constant series has NULL acf (zero
    variance)."""
    from blueforty___etl_data_pipeline_spark.operators.temporal import acf

    alt = spark.createDataFrame(
        [(t, 100 if t % 2 == 0 else -100) for t in range(40)],
        ["t", "v"],
    )
    out = {r["lag"]: r for r in acf(alt, "t", "v", max_lag=4).collect()}
    assert out[1]["n_pairs"] == 39
    # finite-sample: |r_1 + 1| small, |r_2 - 1| small (e6 scale)
    assert out[1]["acf_e6"] < -900000
    assert out[2]["acf_e6"] > 900000

    per4 = spark.createDataFrame(
        [(t, [10, 0, -10, 0][t % 4]) for t in range(48)], ["t", "v"]
    )
    r = {
        row["lag"]: row["acf_e6"]
        for row in acf(per4, "t", "v", max_lag=4).collect()
    }
    assert r[4] > r[1] and r[4] > r[2] and r[4] > r[3]
    assert r[4] > 900000 and r[2] < -900000

    const = spark.createDataFrame([(t, 7) for t in range(10)], ["t", "v"])
    rows = acf(const, "t", "v", max_lag=2).collect()
    assert all(row["acf_e6"] is None for row in rows)


def test_theil_sen_robust_to_outliers(spark):
    """Ground truth: a clean line v = 5t + 3 gives slope 5000
    permille even when 25% of points are wrecked by huge outliers
    (where OLS would be pulled far off); even-count median takes the
    lower middle deterministically."""
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        theil_sen_slope,
    )

    clean = [(t, 5 * t + 3) for t in range(20)]
    r = theil_sen_slope(
        spark.createDataFrame(clean, ["t", "v"]), "t", "v"
    ).collect()[0]
    assert r["n_periods"] == 20
    assert r["n_pairs"] == 190
    assert r["slope_permille"] == 5000

    wrecked = [
        (t, (5 * t + 3 + (10_000_000 if t % 4 == 0 else 0)))
        for t in range(20)
    ]
    r2 = theil_sen_slope(
        spark.createDataFrame(wrecked, ["t", "v"]), "t", "v"
    ).collect()[0]
    assert r2["slope_permille"] == 5000  # median shrugs off 25% junk

    # two points: single pair, slope floor(1000 * dv / dt)
    two = spark.createDataFrame([(0, 0), (3, 10)], ["t", "v"])
    r3 = theil_sen_slope(two, "t", "v").collect()[0]
    assert (r3["n_pairs"], r3["slope_permille"]) == (1, 3333)


def test_holt_smoothing_recurrence_and_checksum(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        holt_smoothing,
    )

    xs = [100, 120, 90, 150, 130, 200]
    df = spark.createDataFrame(
        list(enumerate(xs)), "t long, x long"
    )
    got = holt_smoothing(df, "t", "x").collect()[0]

    # replay the integer recurrence locally (trunc division like
    # Spark's div)
    def tdiv(a, b):
        return int(a / b) if a * b > 0 or a % b == 0 else -((-a) // b)

    s, b, ck = xs[0], 0, xs[0]
    for x in xs[1:]:
        s2 = tdiv(200 * x + 800 * (s + b), 1000)
        b = tdiv(100 * (s2 - s) + 900 * b, 1000)
        s = s2
        ck += s
    assert got["n_periods"] == 6
    assert got["level"] == s and got["trend"] == b
    assert got["forecast_7"] == s + 7 * b
    assert got["level_checksum"] == ck

    # constant series: level == the constant, zero trend
    dfc = spark.createDataFrame(
        [(i, 500) for i in range(10)], "t long, x long"
    )
    rc = holt_smoothing(dfc, "t", "x").collect()[0]
    assert rc["level"] == 500 and rc["trend"] == 0


def test_merge_intervals_islands(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        merge_intervals,
    )

    rows = [
        # user 1: [0,10] [5,12] touch-merge [12,20], then gap, [30,35]
        (1, 1, 0, 10),
        (1, 2, 5, 12),
        (1, 3, 12, 20),   # touching (start == running max) merges
        (1, 4, 30, 35),
        # user 2: nested interval collapses
        (2, 5, 0, 100),
        (2, 6, 10, 20),
        # user 2: a later interval fully covered by running max
        (2, 7, 50, 60),
    ]
    df = spark.createDataFrame(rows, "u long, id long, s long, e long")
    got = {
        (r["key"], r["island_id"]): r
        for r in merge_intervals(df, "u", "s", "e", "id").collect()
    }
    assert len(got) == 3
    i1 = got[(1, 1)]
    assert (i1["island_start_us"], i1["island_end_us"]) == (0, 20)
    assert i1["n_intervals"] == 3 and i1["covered_us"] == 20
    i2 = got[(1, 2)]
    assert (i2["island_start_us"], i2["island_end_us"]) == (30, 35)
    u2 = got[(2, 1)]
    assert (u2["island_start_us"], u2["island_end_us"]) == (0, 100)
    assert u2["n_intervals"] == 3
    # covered != sum of member lengths when members overlap
    assert u2["covered_us"] == 100 != (100 + 10 + 10)


def test_lag_features_gap_days_and_no_leakage(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        lag_features,
    )

    rows = [
        ("a", "2024-01-01", 10),
        ("a", "2024-01-02", 20),
        ("a", "2024-01-04", 40),   # Jan 3 missing
        ("a", "2024-01-09", 90),
        ("b", "2024-01-01", 1),
    ]
    df = spark.createDataFrame(rows, "k string, day string, n long").select(
        "k", F.to_date("day").alias("day"), "n"
    )
    got = {
        (r["k"], str(r["day"])): (
            r["lag_1"], r["lag_7"], r["roll_sum"], r["roll_n"]
        )
        for r in lag_features(df, "k", "day", "n").collect()
    }
    # gap day: Jan 4's lag_1 is NULL (Jan 3 absent), NOT Jan 2's value
    assert got[("a", "2024-01-04")] == (None, None, 30, 2)
    assert got[("a", "2024-01-02")] == (10, None, 10, 1)
    # rolling window excludes the current day (no target leakage) and
    # honors the 7-day range: Jan 9 sees Jan 2 (d-7) and Jan 4 only
    assert got[("a", "2024-01-09")] == (None, 20, 60, 2)
    # keys are independent
    assert got[("b", "2024-01-01")] == (None, None, None, 0)


def test_seasonal_naive_mase_hand_computed(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        seasonal_naive_mase,
    )

    # perfectly 2-periodic series: seasonal-naive (season=2) errors are
    # ALL zero, naive lag-1 errors are all 10 → mase 0
    rows = [(t, 100 if t % 2 == 0 else 110) for t in range(8)]
    df = spark.createDataFrame(rows, "t long, y long")
    r = seasonal_naive_mase(df, "t", "y", season=2).collect()[0]
    assert (
        r["n_points"], r["n_seasonal_terms"], r["n_naive_terms"],
        r["mase_permille"],
    ) == (8, 6, 7, 0)

    # trending series y=t: seasonal error |t-(t-2)|=2 (6 terms), naive
    # error 1 (7 terms) → 1000*2*6*7 // (1*7*6) = 2000
    df2 = spark.createDataFrame([(t, t) for t in range(8)], "t long, y long")
    r2 = seasonal_naive_mase(df2, "t", "y", season=2).collect()[0]
    assert r2["mase_permille"] == 2000


def test_lateness_profile_buckets(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        lateness_profile,
    )

    # one user, arrival order k: timestamps 0s, 10s, 5s, 3s, 20s
    # → lateness 0, 0, 5s, 7s, 0 → buckets 0 (×3), 4, 4
    rows = [(1, 0, 0), (1, 1, 10), (1, 2, 5), (1, 3, 3), (1, 4, 20)]
    df = spark.createDataFrame(
        rows, "user_id long, k long, sec long"
    ).select(
        "user_id", "k", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    got = {
        r["bucket_s"]: (r["n_events"], r["n_keys"])
        for r in lateness_profile(
            df, ts_col="ts", order_col="k", key_col="user_id"
        ).collect()
    }
    # 5s late → late_s+1 = 6 → bucket 4; 7s late → 8 → bucket 8
    assert got == {0: (3, 1), 4: (1, 1), 8: (1, 1)}


def test_stl_lite_identity_and_medians(spark):
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        stl_lite,
    )

    # constant series + perfect period-2 wobble: trend captures the
    # level, seasonal captures the wobble, residual is all zero
    rows = [(t, 100 + (5 if t % 2 == 0 else -5)) for t in range(12)]
    df = spark.createDataFrame(rows, "t long, y long")
    got = {r["t"]: r for r in stl_lite(df, "t", "y", season=2, trend_window=3).collect()}
    for t, r in got.items():
        # additive identity holds everywhere by construction
        assert r["trend"] + r["seasonal"] + r["residual"] == r["y"]
    # exact hand-derived components (lower-median semantics: a window
    # [95,105,105] has lower median 105, so the 3-window trend
    # anti-correlates with a period-2 signal — deterministic, and the
    # seasonal phase medians absorb it into a constant offset)
    assert [got[t]["trend"] for t in range(12)] == [
        95, 105, 95, 105, 95, 105, 95, 105, 95, 105, 95, 95
    ]
    assert {t % 2: got[t]["seasonal"] for t in range(12)} == {0: 20, 1: 0}
    assert [got[t]["residual"] for t in range(12)] == [-10] * 11 + [0]
    with _pytest.raises(ValueError, match="trend_window"):
        stl_lite(df, "t", "y", trend_window=4)


def test_resample_interp_linear_gap_fill(spark):
    """Linear interpolation: a 3-hour gap between v=100 and v=400
    fills with 200 and 300 (exact thirds); observed buckets keep their
    values; falling series floor correctly."""
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        resample_interp,
    )

    rows = [
        ("a", "2024-01-01 00:30:00", 1, 100),
        ("a", "2024-01-01 03:10:00", 2, 400),
        ("b", "2024-01-01 00:00:00", 3, 10),
        ("b", "2024-01-01 02:00:00", 4, 3),  # falling: 10 -> 3
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, event_id long, vm long"
    ).select("k", F.to_timestamp("ts").alias("ts"), "event_id", "vm")
    out = {
        (r["k"], r["bucket_ts"].hour): (r["vm"], r["observed"])
        for r in resample_interp(
            df, ["k"], "ts", "vm", tiebreak_cols=["event_id"]
        ).collect()
    }
    assert out[("a", 0)] == (100, True)
    assert out[("a", 1)] == (200, False)
    assert out[("a", 2)] == (300, False)
    assert out[("a", 3)] == (400, True)
    # falling series: midpoint floor((10+3)/2) = 6 (true value 6.5)
    assert out[("b", 1)] == (6, False)


def test_gaps_and_islands_runs_dups_and_singletons(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        gaps_and_islands,
    )

    rows = [
        # key 1: run 1-3 (with a duplicate 2), gap, singleton 7
        (1, 1), (1, 2), (1, 2), (1, 3), (1, 7),
        # key 2: two runs 10-11 and 13-15
        (2, 10), (2, 11), (2, 13), (2, 14), (2, 15),
        # key 3: all isolated
        (3, 0), (3, 2), (3, 4),
    ]
    df = spark.createDataFrame(rows, "k long, v long")
    out = gaps_and_islands(df, "k", "v")
    got = {
        (r["k"], r["island_start"]): (r["island_end"], r["island_len"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): (3, 3), (1, 7): (7, 1),
        (2, 10): (11, 2), (2, 13): (15, 3),
        (3, 0): (0, 1), (3, 2): (2, 1), (3, 4): (4, 1),
    }


def test_sequence_gaps_between_islands(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        sequence_gaps,
    )

    rows = [
        (1, 1), (1, 2), (1, 3), (1, 7), (1, 10),   # gaps 4-6 and 8-9
        (2, 5), (2, 6),                             # consecutive: none
    ]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r["k"], r["gap_start"]): (r["gap_end"], r["gap_len"])
        for r in sequence_gaps(df, "k", "v").collect()
    }
    assert got == {(1, 4): (6, 3), (1, 8): (9, 2)}


def test_allen_relations_all_seven(spark):
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        allen_relations,
    )

    rows = [
        # key 1 exercises every relation against interval id=1 [10,20]
        (1, 1, 10, 20),
        (1, 2, 25, 30),   # before (1 ends before 2 starts)
        (1, 3, 20, 25),   # meets
        (1, 4, 15, 25),   # overlaps
        (1, 5, 10, 25),   # starts (same start, 1 ends first)
        (1, 6, 12, 18),   # during (6 inside 1)
        (1, 7, 5, 20),    # finishes (1 finishes 7)
        (1, 8, 10, 20),   # equals
    ]
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")
    out = {
        (r["id_a"], r["id_b"]): r["relation"]
        for r in allen_relations(df, "k", "id", "s", "e").collect()
        if r["id_a"] == 1
    }
    assert out == {
        (1, 2): "before", (1, 3): "meets", (1, 4): "overlaps",
        (1, 5): "starts", (1, 6): "during", (1, 7): "finishes",
        (1, 8): "equals",
    }


def test_dyadic_ewma_exact_fold_and_partition_invariance(spark):
    """y₀=x₀ then yₜ=(xₜ+3yₜ₋₁)÷4 exactly, independent of input
    partitioning (the fold runs over a sorted collected array)."""
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        dyadic_ewma,
    )

    rows = [("k", 0, 4), ("k", 1, 8), ("k", 2, 4), ("k", 3, 100),
            ("j", 5, 7)]
    df = spark.createDataFrame(rows, "k string, o long, x long")
    for parts in (1, 4):
        got = sorted(
            (r["k"], r["o"], r["ewma"])
            for r in dyadic_ewma(df.repartition(parts), "k", "o",
                                 "x").collect()
        )
        # k: 4 -> (8+12)//4=5 -> (4+15)//4=4 -> (100+12)//4=28
        assert got == [("j", 5, 7), ("k", 0, 4), ("k", 1, 5),
                       ("k", 2, 4), ("k", 3, 28)]
    with __import__("pytest").raises(ValueError):
        dyadic_ewma(df, "k", "o", "x", shift=0)


def test_cross_correlation_finds_true_lag(spark):
    """B = A shifted by 2 buckets: r_e6 = exactly 1e6 at lag 2 (exact
    shift), < 1e6 elsewhere; pair counts shrink with lag."""
    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        cross_correlation,
    )

    vals = [1, 5, 2, 8, 3, 9, 4, 7, 6, 2, 8, 1]
    a = spark.createDataFrame(list(enumerate(vals)), "bucket long, v long")
    b = spark.createDataFrame(
        [(t + 2, v) for t, v in enumerate(vals)], "bucket long, v long"
    )
    out = {r["lag"]: (r["n_pairs"], r["r_e6"])
           for r in cross_correlation(a, b, max_lag=3).collect()}
    assert out[2] == (12, 1000000)
    assert all(out[lag][1] < 1000000 for lag in (0, 1, 3))
    # constant series -> zero variance -> defined 0
    c = spark.createDataFrame([(t, 5) for t in range(8)],
                              "bucket long, v long")
    outc = {r["lag"]: r["r_e6"]
            for r in cross_correlation(c, c, max_lag=1).collect()}
    assert outc[0] == 0 and outc[1] == 0


def test_sax_transform_paa_and_equidepth_symbols(spark):
    """Ticks 0-15 on one key, segment_size 4: PAA means are exact e6
    floor-divisions; NTILE(2) puts the two lower-mean segments in
    band 1, the two higher in band 2.  Partition invariance holds."""
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.temporal import (
        sax_transform,
    )

    vals = [1, 1, 1, 2, 9, 9, 9, 9, 1, 2, 1, 2, 8, 8, 9, 9]
    rows = [("k", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    for parts in (1, 4):
        out = {
            r["segment"]: (r["n_ticks"], r["paa_e6"], r["symbol"])
            for r in sax_transform(
                df.repartition(parts), "k", "t", "v",
                segment_size=4, alphabet=2,
            ).collect()
        }
        assert out[0] == (4, (5 * 10**6) // 4, 1)      # mean 1.25
        assert out[1] == (4, 9 * 10**6, 2)             # mean 9
        assert out[2] == (4, (6 * 10**6) // 4, 1)      # mean 1.5
        assert out[3] == (4, (34 * 10**6) // 4, 2)     # mean 8.5
    with pytest.raises(ValueError):
        sax_transform(df, "k", "t", "v", alphabet=1)
