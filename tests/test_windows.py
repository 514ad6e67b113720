"""Event-time windows: literal-timestamp semantics + the driver's own
events table end-to-end (TIMESTAMP(NANOS) regression)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.sources.catalog import load_table
from blueforty___etl_data_pipeline_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

T0 = datetime.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


def test_tumbling_counts(spark):
    df = _events(
        spark,
        [
            (T0, 1, "a", 1.0),
            (T0 + datetime.timedelta(minutes=59), 1, "a", 1.0),
            (T0 + datetime.timedelta(minutes=61), 1, "a", 1.0),
        ],
    )
    out = tumbling_window_agg(df, "1 hour", keys=("event_type",))
    counts = sorted(r["n_events"] for r in out.collect())
    assert counts == [1, 2]


def test_sliding_every_event_in_two_windows(spark):
    df = _events(spark, [(T0 + datetime.timedelta(minutes=10), 1, "a", 1.0)])
    out = sliding_window_agg(df, "1 hour", "30 minutes").collect()
    starts = sorted(r["window_start"] for r in out)
    assert starts == [
        T0 - datetime.timedelta(minutes=30),
        T0,
    ]


def test_session_merge_and_split(spark):
    # Spark merges ADJACENT per-event windows: an exactly-30min gap still
    # extends the session; only a strictly-greater gap splits.  This pins
    # the semantics the DuckDB oracle must mirror ('>', not '>=').
    df = _events(
        spark,
        [
            (T0, 1, "a", 1.0),
            (T0 + datetime.timedelta(minutes=30), 1, "a", 1.0),
            (T0 + datetime.timedelta(minutes=60, seconds=1), 1, "a", 1.0),
        ],
    )
    out = sorted(
        session_window_agg(df, gap="30 minutes").collect(),
        key=lambda r: r["session_start"],
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2  # exact-gap event merged
    assert out[0]["session_end"] == T0 + datetime.timedelta(minutes=60)
    assert out[1]["n_events"] == 1  # gap+1s split


def test_session_just_under_gap_merges(spark):
    df = _events(
        spark,
        [
            (T0, 1, "a", 1.0),
            (T0 + datetime.timedelta(minutes=29, seconds=59), 1, "a", 1.0),
        ],
    )
    out = session_window_agg(df, gap="30 minutes").collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_events_table_end_to_end(spark, sf_small):
    # Round-1 regression: events.parquet is TIMESTAMP(NANOS) — the read
    # crashed outright and F.window rejected the bigint ts.
    ev = load_table(spark, sf_small, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    out = tumbling_window_agg(ev, "1 hour")
    assert out.select(F.sum("n_events")).collect()[0][0] == ev.count()
    sess = session_window_agg(ev, gap="30 minutes")
    assert sess.select(F.sum("n_events")).collect()[0][0] == ev.count()


def test_streaming_shape_available_now(spark, sf_small, tmp_path):
    # The SAME transformation runs under readStream: copy events to a
    # stream dir, run one availableNow micro-batch into a memory sink.
    from blueforty___etl_data_pipeline_spark.streaming.windows import (
        stream_from_parquet,
    )

    ev = load_table(spark, sf_small, "events")
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)
    stream = stream_from_parquet(
        spark, src, schema=ev.schema, watermark="2 hours"
    )
    agg = tumbling_window_agg(stream, "1 hour", keys=("event_type",))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("SELECT SUM(n_events) FROM win_test").collect()[0][0]
    assert total == ev.count()


def test_streaming_session_window_available_now(spark, sf_small, tmp_path):
    # Gap-session aggregation under readStream: session_window carries
    # per-key session state; watermark bounds it.  One availableNow
    # batch over the whole fixture must reproduce the batch row total.
    from blueforty___etl_data_pipeline_spark.streaming.windows import (
        session_window_agg,
        stream_from_parquet,
    )

    ev = load_table(spark, sf_small, "events")
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    stream = stream_from_parquet(
        spark, src, schema=ev.schema, watermark="2 hours"
    )
    agg = session_window_agg(stream, gap="30 minutes", keys=("user_id",))
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("SELECT SUM(n_events) FROM sess_test").collect()[0][0]
    assert total == ev.count()
    # session invariant: end - start >= gap for every emitted session
    bad = spark.sql(
        "SELECT COUNT(*) FROM sess_test "
        "WHERE session_end < session_start + INTERVAL 30 MINUTES"
    ).collect()[0][0]
    assert bad == 0


@pytest.mark.slow
def test_streaming_update_mode_incremental_counts(spark, sf_small, tmp_path):
    # outputMode('update'): only groups changed by the micro-batch are
    # emitted.  Split the fixture into two file batches; the union of
    # update emissions must equal the full-batch result for every key
    # (last emission per key wins).
    import glob

    from blueforty___etl_data_pipeline_spark.streaming.windows import (
        tumbling_window_agg,
    )

    ev = load_table(spark, sf_small, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "upd_src")
    half1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        # wider than the fixture's time span: batch 2 replays the odd
        # half across the WHOLE timeline, and this test pins merge
        # semantics, not late-drop (test_watermark_* covers dropping)
        .withWatermark("ts", "3650 days")
    )
    agg = tumbling_window_agg(stream, "1 hour", keys=("event_type",))
    rows = []

    def sink(df, epoch_id):
        rows.extend(df.collect())

    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_first_run = len(rows)
    # append the second half; the SAME checkpoint makes run 2 a purely
    # incremental continuation — it reads only the new file and merges
    # into restored state.
    half2.coalesce(1).write.mode("append").parquet(src)
    q2 = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert n_first_run > 0 and len(rows) > n_first_run

    # last emission per (window_start, event_type) must match batch truth
    latest = {}
    for r in rows:
        latest[(r["window_start"], r["event_type"])] = r["n_events"]
    truth = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_window_agg(
            ev, "1 hour", keys=("event_type",)
        ).collect()
    }
    assert latest == truth


def test_rfm_segments_tiles_and_label(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        rfm_segments,
    )

    # 4 users with strictly ordered recency/frequency/monetary so every
    # quartile holds exactly one user and the label is predictable
    rows = []
    for u in range(4):
        # user u: last event at day u (user 3 most recent), u+1 events
        # of value 10*(u+1)
        for k in range(u + 1):
            rows.append((u, f"2024-01-0{u + 1}", 10.0 * (u + 1)))
    df = spark.createDataFrame(
        rows, "user_id long, d string, value double"
    ).select("user_id", F.to_timestamp("d").alias("ts"), "value")
    got = {r["user_id"]: r for r in rfm_segments(df).collect()}
    # user 3: most recent (r 4), most frequent (f 4), highest value (m 4)
    assert got[3]["segment"] == "444"
    assert got[0]["segment"] == "111"
    assert got[0]["recency_days"] == 3 and got[3]["recency_days"] == 0
    assert [got[u]["f_tile"] for u in range(4)] == [1, 2, 3, 4]


def test_exact_global_rank_matches_window_row_number(spark):
    """The distributed two-phase rank must equal a bare global
    ROW_NUMBER bit-for-bit, including NTILE-relevant tie handling and
    the uneven-bucket edge (n not divisible by the chunk count)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        exact_global_rank,
    )

    import random

    rng = random.Random(7)
    # heavy ties: values drawn from a tiny domain, unique tie ids
    rows = [(i, rng.randrange(5)) for i in range(137)]
    df = spark.createDataFrame(rows, "id long, v long")
    got, n = exact_global_rank(df, "v", "id", out_col="r", n_chunks=8)
    assert n == 137
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        (r["id"], r["v"]): r["r"]
        for r in df.select(
            "id", "v", F.row_number().over(w).cast("long").alias("r")
        ).collect()
    }
    assert {(r["id"], r["v"]): r["r"] for r in got.collect()} == want


def test_exact_global_rank_nulls_rank_first(spark):
    """NULL values must rank first (ASC NULLS FIRST), matching a bare
    global ROW_NUMBER — regression for the CASE-chain bucketer sending
    NULLs to the LAST chunk while the per-chunk window sorted them
    first (ADVICE r10)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        exact_global_rank,
    )

    rows = [(i, None if i % 7 == 0 else float(i % 11)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, v double")
    got, n = exact_global_rank(df, "v", "id", out_col="r", n_chunks=8)
    assert n == 80
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["r"]
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("r")
        ).collect()
    }
    assert {r["id"]: r["r"] for r in got.collect()} == want


def test_isotonic_calibration_pools_violations(spark):
    """PAV must pool adjacent bins whose raw rates violate
    monotonicity, with the pooled rate = pooled_pos/pooled_n, and
    leave already-monotone runs untouched."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        isotonic_calibration,
    )

    # 4 bins of 10 rows: raw rates 0.2, 0.6, 0.4, 0.9 -- bins 1 and 2
    # violate (0.6 > 0.4) and pool to (6+4)/20 = 0.5
    rows = []
    for b, npos in [(0, 2), (1, 6), (2, 4), (3, 9)]:
        pred = b * 250_000 + 1  # lands in bin b at n_bins=4
        rows += [(pred, i < npos) for i in range(10)]
    df = spark.createDataFrame(rows, "pred_e6 long, y boolean")
    got = {
        r["bin"]: (r["raw_rate_e6"], r["iso_rate_e6"])
        for r in isotonic_calibration(df, "pred_e6", "y", n_bins=4).collect()
    }
    assert got[0] == (200000, 200000)
    assert got[1] == (600000, 500000)
    assert got[2] == (400000, 500000)
    assert got[3] == (900000, 900000)
    iso = [got[b][1] for b in range(4)]
    assert iso == sorted(iso)


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a token run of >= window + k - 1 tokens share at least one
    fingerprint; and selection volume is far below full shingling."""
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = 4 + 3 - 1
    df = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "uno dos " + shared + " tres quatro cinco seis"),
            (3, "completely different words everywhere here today"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # volume: doc 3 has 8 tokens -> 6 grams -> 3 windows -> <= 3 fps
    assert len(by_doc[3]) <= 3


@pytest.mark.slow
def test_exact_global_rank_property(spark):
    """Property (hypothesis): for arbitrary value multisets — heavy
    ties, negatives, constants — and arbitrary chunk counts, the
    distributed rank equals the global ROW_NUMBER bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        exact_global_rank,
    )

    vals = st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=80
    )

    @settings(max_examples=6, deadline=None)
    @given(values=vals, n_chunks=st.sampled_from([2, 5, 16]))
    def check(values, n_chunks):
        df = spark.createDataFrame(
            list(enumerate(values)), "id long, v long"
        )
        got, n = exact_global_rank(
            df, "v", "id", out_col="r", n_chunks=n_chunks
        )
        assert n == len(values)
        w = Window.orderBy(F.asc("v"), F.asc("id"))
        want = {
            r["id"]: r["r"]
            for r in df.select(
                "id", F.row_number().over(w).cast("long").alias("r")
            ).collect()
        }
        assert {r["id"]: r["r"] for r in got.collect()} == want

    check()


@pytest.mark.slow
def test_skyline_2d_dominance_and_ties(spark):
    """skyline_2d (round 11): strict dominance, same-x and same-y
    ties, and coordinate duplicates — checked against the hand-worked
    frontier, at two chunk counts (chunk boundaries must never change
    the result)."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        skyline_2d,
    )

    rows = [
        (1, 1, 5),   # frontier
        (2, 3, 3),   # frontier
        (3, 3, 3),   # duplicate of 2 -> kept (duplicates don't dominate)
        (4, 3, 4),   # same x as 2, larger y -> dominated
        (5, 5, 3),   # larger x, equal y vs 2 -> dominated
        (6, 2, 6),   # dominated by (1,5)
        (7, 0, 9),   # frontier (smallest x)
        (8, 6, 1),   # frontier (smallest y)
        (9, 6, 2),   # same x as 8, larger y -> dominated
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for nc in (2, 64):
        got = {r["id"] for r in skyline_2d(df, "x", "y", n_chunks=nc).collect()}
        assert got == {1, 2, 3, 7, 8}, (nc, got)


@pytest.mark.slow
def test_density_ratio_outliers_hand_case_and_cap(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        density_ratio_outliers,
    )

    # tight cluster at origin (ids 1-4, pairwise within eps) + one
    # point at quantized distance 3 (inside eps=4 of the cluster) +
    # one isolated far point.  scale=1 keeps coords = quantized ints.
    rows = [
        (1, 0.0, 0.0), (2, 1.0, 0.0), (3, 0.0, 1.0), (4, 1.0, 1.0),
        (5, 3.0, 0.0),
        (9, 100.0, 100.0),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {
        r["id"]: r
        for r in density_ratio_outliers(
            df, "id", "x", "y", scale=1, eps_q=4
        ).collect()
    }
    # everyone in {1..5} is within d2<=16 of everyone else: n_nb=4,
    # density=5 for all five -> factor exactly 1.0
    for i in (1, 2, 3, 4, 5):
        assert out[i]["n_neighbors"] == 4
        assert out[i]["density"] == 5
        assert out[i]["factor_e6"] == 1000000
    assert out[9]["n_neighbors"] == 0
    assert out[9]["factor_e6"] == -1

    # edge point: 5 moved to (4,0): inside eps of 2 (d2=9) and 1
    # (d2=16), outside 3 (d2=17) and 4 (d2=10 -> inside!) recompute:
    # (4,0) vs (1,1): 9+1=10 <= 16 inside; vs (0,1): 16+1=17 out.
    rows2 = [
        (1, 0.0, 0.0), (2, 1.0, 0.0), (3, 0.0, 1.0), (4, 1.0, 1.0),
        (5, 4.0, 0.0),
    ]
    df2 = spark.createDataFrame(rows2, "id long, x double, y double")
    out2 = {
        r["id"]: r
        for r in density_ratio_outliers(
            df2, "id", "x", "y", scale=1, eps_q=4
        ).collect()
    }
    # 5's neighbors: 1 (d2=16), 2 (d2=9), 4 (d2=10) -> n_nb=3, dens=4
    # 1,2,4 have n_nb=4 (cluster + 5), dens=5; 3 has n_nb=3, dens=4
    assert out2[5]["n_neighbors"] == 3 and out2[5]["density"] == 4
    assert out2[3]["n_neighbors"] == 3 and out2[3]["density"] == 4
    # factor(5) = (5+5+5)/(3*4) = 15/12 = 1.25 -> 1250000
    assert out2[5]["factor_e6"] == 1250000
    # factor(1) = (5+4+5+4)/(4*5) = 18/20 = 0.9 -> 900000
    assert out2[1]["factor_e6"] == 900000

    # cap: same dense cell, neighbor side cut to 2 lowest ids
    df3 = spark.createDataFrame(
        [(i, 0.0, 0.0) for i in range(1, 6)], "id long, x double, y double"
    )
    out3 = {
        r["id"]: r
        for r in density_ratio_outliers(
            df3, "id", "x", "y", scale=1, eps_q=4, max_cell_neighbors=2
        ).collect()
    }
    # neighbor pool = ids {1,2}; 1 sees only 2, 2 sees only 1,
    # 3-5 see both
    assert out3[1]["n_neighbors"] == 1 and out3[2]["n_neighbors"] == 1
    for i in (3, 4, 5):
        assert out3[i]["n_neighbors"] == 2


def test_density_ratio_outliers_cap_hidden_neighbor_density(spark):
    """Round-12 regression (ADVICE r11): with max_cell_neighbors=1 the
    pool is {1}; point 1's own pool-visible neighborhood is empty
    (itself is excluded), so density(1) is undefined — but points 2-5
    each sample neighbor 1.  The old inner join dropped 2-5 entirely
    (reported n_neighbors=0 / factor -1 despite a nonzero sampled
    count); the fix keeps their counts and credits the hidden
    neighbor the provable lower-bound density 2."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        density_ratio_outliers,
    )

    df = spark.createDataFrame(
        [(i, 0.0, 0.0) for i in range(1, 6)], "id long, x double, y double"
    )
    out = {
        r["id"]: r
        for r in density_ratio_outliers(
            df, "id", "x", "y", scale=1, eps_q=4, max_cell_neighbors=1
        ).collect()
    }
    # 1 sees pool \ {1} = {} -> genuinely zero sampled neighbors
    assert out[1]["n_neighbors"] == 0 and out[1]["factor_e6"] == -1
    # 2-5 each see exactly {1}: n_nb=1, dens=2, hidden db -> 2,
    # factor = 1e6 * 2 div (1 * 2) = 1e6
    for i in (2, 3, 4, 5):
        assert out[i]["n_neighbors"] == 1, out[i]
        assert out[i]["density"] == 2
        assert out[i]["factor_e6"] == 1000000


def test_mutual_information_hand_case(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        mutual_information,
    )

    # perfectly associated 2x2: MI = ln 2; independent 2x2: MI = 0
    dep = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, "a string, b string"
    )
    out = {(r["a"], r["b"]): r["mi_e9"]
           for r in mutual_information(dep, "a", "b").collect()}
    # each cell: (5/10)*ln((5*10)/(5*5)) = 0.5*ln2
    for v in out.values():
        assert v == math.floor(1e9 * 0.5 * math.log(2.0))

    ind = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3,
        "a string, b string",
    )
    got = [r["mi_e9"] for r in mutual_information(ind, "a", "b").collect()]
    # ln(1) = 0 exactly for every cell (floor keeps it 0)
    assert got == [0, 0, 0, 0]


@pytest.mark.slow
def test_pca_project_2d_known_axes(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        pca_project_2d,
    )

    # variance purely along x (scale=1 keeps coords = ints)
    xs = [(i, float(v), 0.0) for i, v in enumerate([-2, -1, 0, 1, 2])]
    df = spark.createDataFrame(xs, "id long, x double, y double")
    out = {r["id"]: r for r in
           pca_project_2d(df, "id", "x", "y", scale=1).collect()}
    # pc1 = centered x exactly; axis explains 100% of variance
    assert [out[i]["pc1_e3"] for i in range(5)] == [
        -2000, -1000, 0, 1000, 2000
    ]
    assert all(r["var_ratio_e6"] == 1000000 for r in out.values())

    # variance purely along y -> the b=0, a<=c degenerate branch
    ys = [(i, 0.0, float(v)) for i, v in enumerate([-2, -1, 0, 1, 2])]
    df2 = spark.createDataFrame(ys, "id long, x double, y double")
    out2 = {r["id"]: r["pc1_e3"] for r in
            pca_project_2d(df2, "id", "x", "y", scale=1).collect()}
    assert [out2[i] for i in range(5)] == [-2000, -1000, 0, 1000, 2000]

    # diagonal cloud: principal axis ~ (1,1)/sqrt(2)
    dg = [(i, float(v), float(v)) for i, v in enumerate([-1, 0, 1])]
    df3 = spark.createDataFrame(dg, "id long, x double, y double")
    out3 = {r["id"]: r["pc1_e3"] for r in
            pca_project_2d(df3, "id", "x", "y", scale=1).collect()}
    # distance along the diagonal = v*sqrt(2): 1.414...
    assert out3[0] == -1415 and out3[1] == 0 and out3[2] == 1414

    # zero-variance cloud: everything projects to 0, ratio pinned
    zz = spark.createDataFrame(
        [(1, 3.0, 3.0), (2, 3.0, 3.0)], "id long, x double, y double"
    )
    out4 = pca_project_2d(zz, "id", "x", "y", scale=1).collect()
    assert all(r["pc1_e3"] == 0 for r in out4)
    assert all(r["var_ratio_e6"] == 1000000 for r in out4)


def test_ips_policy_value_uniform_target(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ips_policy_value,
    )

    # action a logged 4x with reward 2.0, b logged 1x with reward 10.0
    rows = [("a", 2.0)] * 4 + [("b", 10.0)]
    df = spark.createDataFrame(rows, "action string, reward double")
    out = {r["action"]: r for r in
           ips_policy_value(df, "action", "reward").collect()}
    assert out["a"]["n"] == 4 and out["b"]["n"] == 1
    assert out["a"]["propensity_e9"] == 800000000
    assert out["a"]["mean_reward_micros"] == 2000000
    # uniform target: V = (2 + 10)/2 = 6.0; contributions 1.0 and 5.0
    assert out["a"]["ips_contrib_micros"] == 1000000
    assert out["b"]["ips_contrib_micros"] == 5000000


def test_ips_policy_value_negative_rewards_trunc(spark):
    """Round-13 regression (ADVICE r12, reverting the r11 "fix"):
    negative reward sums must TRUNCATE toward zero like DuckDB's
    integer `//` (verified on DuckDB 1.0.0: -7 // 2 = -3 on BIGINT and
    HUGEINT alike — it is trunc, not floor).  mean over n=3 of sum
    -7e6 -> trunc = -2333333 (floor would say -2333334)."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        ips_policy_value,
    )

    rows = [("a", -3.0), ("a", -3.0), ("a", -1.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, "action string, reward double")
    out = {r["action"]: r for r in
           ips_policy_value(df, "action", "reward").collect()}
    assert out["a"]["mean_reward_micros"] == -2333333  # floor: -2333334
    assert out["a"]["ips_contrib_micros"] == -1166666  # trunc(-7e6/6)
    assert out["b"]["ips_contrib_micros"] == 1000000 // 2


def test_cuped_adjust_negative_metric_trunc(spark):
    """mean_y_micros truncates on negative sums (DuckDB `//` parity —
    ADVICE r12: DuckDB integer `//` is trunc, not floor)."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        cuped_adjust,
    )

    rows = [("A", 1, -5), ("A", 2, -2), ("A", 3, 1),
            ("B", 1, 4), ("B", 2, 5), ("B", 3, 7)]
    df = spark.createDataFrame(rows, "variant string, x long, y long")
    out = {r["variant"]: r for r in
           cuped_adjust(df, "x", "y", "variant").collect()}
    assert out["A"]["mean_y_micros"] == -2  # -6/3 exact either way
    assert out["B"]["mean_y_micros"] == 16 // 3 == 5
    # a non-divisible negative sum: (-5 + -2 + 2) = -5 over 3
    rows2 = [("A", 1, -5), ("A", 2, -2), ("A", 3, 2)]
    df2 = spark.createDataFrame(rows2, "variant string, x long, y long")
    (row,) = cuped_adjust(df2, "x", "y", "variant").collect()
    assert row["mean_y_micros"] == -1  # trunc(-5/3); floor would say -2


def test_nelson_aalen_hand_case(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        nelson_aalen,
    )

    # durations: t=1 (2 events of 5 at risk), t=2 (1 censored),
    # t=3 (1 event of 2 at risk), t=4 (1 censored)
    rows = [(1, 1), (1, 1), (2, 0), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "d long, e int")
    out = {r["duration"]: r for r in nelson_aalen(df, "d", "e").collect()}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 2
    assert out[1]["hazard_step_e9"] == (10**9 * 2) // 5
    assert out[2]["n_risk"] == 3 and out[2]["hazard_step_e9"] == 0
    assert out[3]["n_risk"] == 2
    assert out[3]["hazard_step_e9"] == (10**9 * 1) // 2
    assert out[4]["cum_hazard_e9"] == (10**9 * 2) // 5 + (10**9) // 2


def test_transition_entropy_deterministic_vs_uniform(spark):
    import datetime
    import math

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        transition_entropy,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: a->b->a->b->a (a always goes to b, b always to a)
    seq1 = ["a", "b", "a", "b", "a"]
    rows += [
        (i, t0 + datetime.timedelta(minutes=i), 1, s)
        for i, s in enumerate(seq1)
    ]
    # user 2: c->x, c->y via two chains c,x,c,y (c splits 50/50)
    seq2 = ["c", "x", "c", "y"]
    rows += [
        (100 + i, t0 + datetime.timedelta(minutes=i), 2, s)
        for i, s in enumerate(seq2)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["action"]: r for r in transition_entropy(df).collect()}
    # 'a' -> always 'b': entropy 0 (p=1, -1*ln(1)=0, floor(-0.0)=0)
    assert out["a"]["entropy_e9"] == 0 and out["a"]["n_next_actions"] == 1
    # 'c' -> x or y each once: H = ln 2
    exp = 2 * math.floor(-1e9 * (0.5 * math.log(0.5)))
    assert out["c"]["entropy_e9"] == exp
    assert out["c"]["n_out"] == 2
    # shares: total transitions = 4 + 3 = 7
    assert out["a"]["share_e9"] == (10**9 * out["a"]["n_out"]) // 7


def test_cuped_adjust_removes_covariate_shift(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        cuped_adjust,
    )

    # y = x + treatment_effect(variant B: +10); x differs by variant
    # (selection bias).  CUPED with theta=1 should recover ~10 gap.
    rows = [
        ("A", 100, 100), ("A", 200, 200), ("A", 300, 300),
        ("B", 400, 410), ("B", 500, 510), ("B", 600, 610),
    ]
    df = spark.createDataFrame(rows, "variant string, x long, y long")
    out = {r["variant"]: r for r in
           cuped_adjust(df, "x", "y", "variant").collect()}
    n, xs = 6, [100, 200, 300, 400, 500, 600]
    ys = [100, 200, 300, 410, 510, 610]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    import math
    assert out["A"]["theta_e9"] == math.floor(1e9 * theta)
    xbar = sx / n
    adj_a = 200 - theta * (200 - xbar)
    adj_b = 510 - theta * (500 - xbar)
    assert out["A"]["mean_adj_micros"] == math.floor(adj_a)
    assert out["B"]["mean_adj_micros"] == math.floor(adj_b)
    # raw gap is 310, dominated by the covariate shift; after the
    # adjustment only a small residual remains (pooled theta > 1
    # because the +10 effect is aligned with x in this fixture, so it
    # absorbs part of the effect too — expected CUPED behavior when
    # the covariate is assignment-correlated)
    raw_gap = out["B"]["mean_y_micros"] - out["A"]["mean_y_micros"]
    adj_gap = out["B"]["mean_adj_micros"] - out["A"]["mean_adj_micros"]
    assert raw_gap == 310 and 0 <= adj_gap <= 20


def test_market_concentration_hand_cases(spark):
    """Monopoly → HHI 1e6; two equal entities → 5e5; shares floor."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        market_concentration,
    )

    d = spark.createDataFrame(
        [("g1", "a", 100), ("g2", "a", 50), ("g2", "b", 50),
         ("g3", "a", 2), ("g3", "b", 1)],
        "g string, e string, v long",
    )
    out = {r["g"]: r for r in
           market_concentration(d, "g", "e", "v").collect()}
    assert out["g1"]["hhi_e6"] == 1000000 and out["g1"]["top_share_e6"] == 1000000
    assert out["g2"]["hhi_e6"] == 500000
    # g3: shares floor to 666666 and 333333 -> hhi
    exp = (666666**2 + 333333**2) // 10**6
    assert out["g3"]["top_share_e6"] == 666666
    assert out["g3"]["hhi_e6"] == exp


def test_two_proportion_ztest_hand_case(spark):
    import math

    import pytest

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        two_proportion_ztest,
    )

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [("b", 0)] * 80
    df = spark.createDataFrame(rows, "variant string, ok int")
    (r,) = two_proportion_ztest(df, "variant", "ok").collect()
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 20)
    p = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert r["z_e6"] == math.floor(1e6 * z)
    assert r["rate_a_e6"] == 300000 and r["rate_b_e6"] == 200000
    with pytest.raises(ValueError):
        two_proportion_ztest(
            df.filter("variant = 'a'"), "variant", "ok"
        ).collect()


def test_anova_f_hand_case_and_div_overflow_guard(spark):
    """Groups [1,2,3],[2,3,4],[7,8,9]: A=231, SSB=62, SSW=6, F=31
    exactly.  Second case uses micros-scale values whose s_g^2/n_g
    quotients exceed int64 — the _dec_floordiv path must still match
    exact Python integer arithmetic (Spark's plain `div` silently
    wraps there)."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        anova_f,
    )

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4),
            ("c", 7), ("c", 8), ("c", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    (r,) = anova_f(df, "g", "v").collect()
    assert (r["n_groups"], r["n_rows"], r["f_e6"]) == (3, 9, 31000000)

    big = [("a", 250_000_000), ("a", 260_000_000), ("b", 490_000_000),
           ("b", 480_000_000), ("c", 10_000), ("c", 20_000)]
    df2 = spark.createDataFrame(big, "g string, v long")
    (r2,) = anova_f(df2, "g", "v").collect()
    import math
    gs = {"a": [250_000_000, 260_000_000], "b": [490_000_000, 480_000_000],
          "c": [10_000, 20_000]}
    A = sum(sum(v) ** 2 // len(v) for v in gs.values())
    S = sum(sum(v) for v in gs.values())
    n = 6
    SS = sum(x * x for v in gs.values() for x in v)
    ssb, ssw, k = A - S * S // n, SS - A, 3
    assert r2["ssb_units"] == ssb // 10**12
    assert r2["ssw_units"] == ssw // 10**12
    assert r2["f_e6"] == math.floor(1e6 * (ssb / (k - 1)) / (ssw / (n - k)))
