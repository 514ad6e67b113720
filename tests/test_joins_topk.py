"""Join and ranking operator semantics (SURVEY.md §2.3, §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.joins import (
    broadcast_cross_join,
    composite_key_join,
    using_join,
)
from blueforty___etl_data_pipeline_spark.operators.topk import (
    argmin_agg,
    top1_per_group,
    topk_per_group,
)


def test_using_join_coalesces_key(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, va string")
    b = spark.createDataFrame([(1, "z")], "k long, vb string")
    out = using_join(a, b, "k")
    assert out.columns == ["k", "va", "vb"]  # key appears once
    assert out.count() == 1


def test_composite_key_join(spark):
    a = spark.createDataFrame([(1, 10), (1, 20), (2, 10)], "k long, d long")
    b = spark.createDataFrame([(1, 10, "hit")], "k2 long, d2 long, tag string")
    out = composite_key_join(a, b, [("k", "k2"), ("d", "d2")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["tag"] == "hit"


def test_broadcast_cross_join_cardinality(spark):
    big = spark.range(7)
    small = spark.createDataFrame([(1,), (2,), (3,)], "s long")
    assert broadcast_cross_join(big, small).count() == 21


def test_broadcast_cross_join_plan_is_bnlj(spark):
    big = spark.range(100)
    small = spark.createDataFrame([(1,), (2,)], "s long")
    plan = broadcast_cross_join(big, small)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_top1_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("g", 2, 1.0), ("g", 1, 1.0), ("g", 3, 0.5)],
        "grp string, id long, score double",
    )
    out = top1_per_group(
        df, partition_by=["grp"], order_by=[F.desc("score"), F.asc("id")]
    ).collect()
    assert len(out) == 1
    assert out[0]["id"] == 1  # equal scores → lowest id wins


def test_topk_keep_rank(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(5)], "grp string, id long, s double"
    )
    out = topk_per_group(
        df,
        partition_by=["grp"],
        order_by=[F.desc("s")],
        k=2,
        keep_rank=True,
    ).collect()
    assert sorted((r["id"], r["rn"]) for r in out) == [(3, 2), (4, 1)]


def test_argmin_agg_matches_window_top1(spark, sf_small):
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_small, "lineitem")
    w = top1_per_group(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        partition_by=["l_orderkey"],
        order_by=[F.asc("l_extendedprice"), F.asc("l_linenumber")],
    )
    a = argmin_agg(
        li,
        keys=["l_orderkey"],
        order_col=F.struct("l_extendedprice", "l_linenumber"),
        payload=F.struct("l_linenumber", "l_extendedprice"),
        alias="best",
    ).select(
        "l_orderkey",
        F.col("best.l_linenumber").alias("l_linenumber"),
        F.col("best.l_extendedprice").alias("l_extendedprice"),
    )
    assert w.exceptAll(a).count() == 0 and a.exceptAll(w).count() == 0


def test_lag_lead_edges(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        with_lag_lead,
    )

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "k long, v long"
    )
    out = {
        (r["k"], r["v"]): (r["prev"], r["next"])
        for r in with_lag_lead(df, "v", ["k"], ["v"]).collect()
    }
    assert out == {
        (1, 10): (None, 20),
        (1, 20): (10, 30),
        (1, 30): (20, None),
        (2, 5): (None, None),
    }


def test_running_sum_rows_framed(spark):
    from pyspark.sql import functions as F2

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        running_sum,
    )

    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)], "k long, seq long, v long"
    )
    out = {
        r["seq"]: r["rs"]
        for r in running_sum(
            df, F2.col("v"), ["k"], ["seq"], alias="rs"
        ).collect()
    }
    assert out == {1: 10, 2: 30, 3: 60}


def test_rank_vs_dense_rank_gaps(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import ranked

    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 50)], "id long, score long"
    )
    r = {
        x["id"]: x["rank"]
        for x in ranked(df, [], [__import__('pyspark').sql.functions.desc("score")]).collect()
    }
    assert r == {1: 1, 2: 1, 3: 3}  # RANK leaves a gap after the tie


def test_null_safe_join_matches_null_buckets(spark):
    from blueforty___etl_data_pipeline_spark.operators.joins import (
        null_safe_join,
    )

    left = spark.createDataFrame(
        [("a", 1), (None, 2)], "k string, lv int"
    )
    right = spark.createDataFrame(
        [("a", 10), (None, 20), ("b", 30)], "k2 string, rv int"
    )
    out = {
        (r["k"], r["rv"])
        for r in null_safe_join(left, right, pairs=[("k", "k2")]).collect()
    }
    # NULL matches NULL; 'b' has no left partner.
    assert out == {("a", 10), (None, 20)}
    # A plain equi-join drops the NULL pair — guard the difference.
    plain = left.join(right, left["k"] == right["k2"]).count()
    assert plain == 1


def test_sessionize_gap_rule(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        sessionize,
    )

    rows = [
        # user 1: events at 0, 10, 50, 65 min → gap 30 splits at 50
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 1, "2024-01-01 00:50:00"),
        (4, 1, "2024-01-01 01:05:00"),
        # user 2: single event
        (5, 2, "2024-01-01 12:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        sessionize,
    )

    # boundary: exactly 30 min is NOT > gap → same session
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00"), (2, 1, "2024-01-01 00:30:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    idx = {r["event_id"]: r["session_idx"] for r in sessionize(df).collect()}
    assert idx == {1: 1, 2: 1}


def test_funnel_requires_strict_order(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        funnel_counts,
    )

    rows = [
        # user 1 completes A→B→C in order
        (1, 1, "A", 10), (2, 1, "B", 20), (3, 1, "C", 30),
        # user 2 does B before A: reaches step 1 only
        (4, 2, "B", 10), (5, 2, "A", 20),
        # user 3 does A and C but no B: step 1 only
        (6, 3, "A", 10), (7, 3, "C", 20),
        # user 4 never does A: counted nowhere
        (8, 4, "B", 10),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(df, steps=("A", "B", "C")).collect()
    }
    assert out == {"A": 3, "B": 1, "C": 1}


def test_funnel_same_timestamp_not_counted(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        funnel_counts,
    )

    # B at the SAME instant as A is not strictly after → step 2 empty
    df = spark.createDataFrame(
        [(1, 1, "A", 10), (2, 1, "B", 10)],
        "event_id long, user_id long, event_type string, sec long",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(df, steps=("A", "B")).collect()
    }
    assert out == {"A": 1, "B": 0}


def test_cohort_retention_offsets(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        cohort_retention,
    )

    rows = [
        # user 1 first seen week of 2024-01-01, returns 2 weeks later
        (1, 1, "2024-01-01 08:00:00"),
        (2, 1, "2024-01-15 08:00:00"),
        # user 2 same cohort week, never returns
        (3, 2, "2024-01-02 08:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    offsets = {k[1]: v for k, v in out.items()}
    assert offsets == {0: 2, 2: 1}


def test_action_sequences_order_and_ties(spark):
    from datetime import datetime

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        action_sequences,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 12, 5, 0)
    rows = [
        # user 1: tie at t0 broken by event_id (2 before 5), then t1
        (1, 5, t0, "b"),
        (1, 2, t0, "a"),
        (1, 9, t1, "c"),
        # user 2: single event
        (2, 7, t1, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {r["user_id"]: r for r in action_sequences(df).collect()}
    assert out[1]["actions"] == "a>b>c"
    assert out[1]["n_events"] == 3
    assert out[1]["first_ts_us"] < out[1]["last_ts_us"]
    assert out[2]["actions"] == "x"
    # partition-invariant: same strings after a shuffle
    again = {
        r["user_id"]: r["actions"]
        for r in action_sequences(df.repartition(7)).collect()
    }
    assert again == {u: r["actions"] for u, r in out.items()}


def test_action_transitions_matrix_and_shares(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        action_transitions,
    )

    # user 1: A->B->A->C ; user 2: B->A.  No cross-user transitions.
    rows = [
        (1, 1, 10, "A"), (2, 1, 20, "B"), (3, 1, 30, "A"), (4, 1, 40, "C"),
        (5, 2, 10, "B"), (6, 2, 20, "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        (r["action"], r["next_action"]): (
            r["n_transitions"], r["share_permille"]
        )
        for r in action_transitions(df).collect()
    }
    assert out == {
        ("A", "B"): (1, 500),
        ("A", "C"): (1, 500),
        ("B", "A"): (2, 1000),
    }


def test_conversion_attribution_strictly_preceding(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        conversion_attribution,
    )

    # user 1: click(10), click(20), purchase(30) -> first 10, last 20.
    # user 2: purchase(10) with a click only AT the same instant
    # (id-later) and after -> unattributed (time-strict).
    # user 3: click AT the same instant with an EARLIER id -> still
    # unattributed: the RANGE frame is time-strict (touch_ts <
    # conversion_ts), not row-positional, so id tiebreaks never leak
    # a same-instant touch into the frame.
    rows = [
        (1, 1, 10, "click"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
        (4, 2, 10, "purchase"), (5, 2, 10, "click"), (6, 2, 20, "click"),
        (7, 3, 10, "click"), (8, 3, 10, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        r["conversion_id"]: (r["first_touch_ts"], r["last_touch_ts"])
        for r in conversion_attribution(df).collect()
    }
    assert out == {3: (10, 20), 4: (None, None), 8: (None, None)}


def test_sequence_match_token_boundaries(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        action_sequences,
    )

    from datetime import datetime, timezone

    def t(m):
        return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)

    # user 1 completes view->click->purchase (with noise between);
    # user 2 has them out of order; user 3's "preview" must NOT match
    # the "view" token.
    rows = [
        (1, 1, t(10), "view"), (2, 1, t(20), "signup"),
        (3, 1, t(30), "click"), (4, 1, t(40), "purchase"),
        (5, 2, t(10), "click"), (6, 2, t(20), "view"),
        (7, 2, t(30), "purchase"),
        (8, 3, t(10), "preview"), (9, 3, t(20), "click"),
        (10, 3, t(30), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    seq = action_sequences(df)
    pat = "(^|.*>)view(>.*)?>click(>.*)?>purchase(>.*|$)"
    hits = sorted(
        r["user_id"] for r in seq.filter(F.col("actions").rlike(pat)).collect()
    )
    assert hits == [1]


def test_running_distinct_counts_first_occurrences(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        running_distinct,
    )

    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 1, 30), ("a", 3, 30),
        ("b", 9, 10),
    ]
    df = spark.createDataFrame(rows, "k string, u long, t long")
    out = {
        (r["k"], r["t"], r["u"]): r["n_distinct_so_far"]
        for r in running_distinct(
            df, key_col="k", order_col="t", distinct_col="u"
        ).collect()
    }
    # t=30 is a tie group: both rows see the group-end value 3 (user 1
    # repeat adds nothing, user 3 is new)
    assert out == {
        ("a", 10, 1): 1, ("a", 20, 2): 2,
        ("a", 30, 1): 3, ("a", 30, 3): 3,
        ("b", 10, 9): 1,
    }


def test_roc_sweep_known_confusion_counts(spark):
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        roc_sweep,
    )

    # scores: positives at 900, 700, 100; negatives at 800, 200, 0
    rows = [
        (900, True), (700, True), (100, True),
        (800, False), (200, False), (0, False),
    ]
    df = spark.createDataFrame(rows, "score long, label boolean")
    out = {
        r["threshold"]: (r["tp"], r["fp"], r["tpr_permille"], r["fpr_permille"])
        for r in roc_sweep(df, "score", "label").collect()
    }
    assert len(out) == 11
    assert out[0] == (3, 3, 1000, 1000)     # everything predicted positive
    assert out[800] == (1, 1, 333, 333)     # 900 and 800 survive
    assert out[1000] == (0, 0, 0, 0)        # nothing reaches 1000
    assert out[200] == (2, 2, 666, 666)     # >=200: 900,700 / 800,200


def test_cohens_kappa_ground_truths(spark):
    """Kappa sanity anchors: identical raters -> 1e6 exactly;
    independent raters with matching marginals -> ~0; a textbook
    2x2 example reproduces its closed-form value."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        cohens_kappa,
    )

    same = spark.createDataFrame(
        [("x", "x")] * 30 + [("y", "y")] * 70, ["a", "b"]
    )
    r = cohens_kappa(same, "a", "b").collect()[0]
    assert (r["po_e6"], r["kappa_e6"]) == (1000000, 1000000)

    # classic example: 2 raters, 100 items, agree on 20 yes + 15 no;
    # marginals 25/75 and 30/70 -> po=.35?? use the standard one:
    # a=20, b=5, c=10, d=15  (n=50)  po=.7  pe=.5  kappa=.4
    rows = (
        [("yes", "yes")] * 20
        + [("yes", "no")] * 5
        + [("no", "yes")] * 10
        + [("no", "no")] * 15
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r2 = cohens_kappa(df, "a", "b").collect()[0]
    assert r2["n"] == 50 and r2["agree"] == 35
    assert r2["po_e6"] == 700000
    # pe = (25*30 + 25*20)/2500 = .5
    assert r2["pe_e6"] == 500000
    assert r2["kappa_e6"] == 400000

    # disjoint label sets: zero chance mass, kappa = po
    disj = spark.createDataFrame(
        [("p", "q")] * 10, ["a", "b"]
    )
    r3 = cohens_kappa(disj, "a", "b").collect()[0]
    assert r3["pe_e6"] == 0 and r3["kappa_e6"] == r3["po_e6"] == 0


def test_chi2_independence_ground_truths(spark):
    """Chi-square anchors: perfectly independent uniform 2x2 -> 0;
    perfectly dependent (diagonal) 2x2 -> n; a textbook asymmetric
    table reproduces its closed-form statistic."""
    from blueforty___etl_data_pipeline_spark.operators.analytics import (
        chi2_independence,
    )

    indep = (
        [("x", "p")] * 25 + [("x", "q")] * 25
        + [("y", "p")] * 25 + [("y", "q")] * 25
    )
    r = chi2_independence(
        spark.createDataFrame(indep, ["a", "b"]), "a", "b"
    ).collect()[0]
    assert (r["n"], r["n_cells"], r["dof"]) == (100, 4, 1)
    assert r["chi2_e6"] == 0
    assert r["cramers_v_e6"] == 0

    dep = [("x", "p")] * 50 + [("y", "q")] * 50
    r2 = chi2_independence(
        spark.createDataFrame(dep, ["a", "b"]), "a", "b"
    ).collect()[0]
    # perfect association in a 2x2: chi2 = n, Cramer's V = 1
    assert r2["chi2_e6"] == 100 * 1000000
    assert r2["dof"] == 1 and r2["n_cells"] == 4  # incl. zero cells
    assert r2["cramers_v_e6"] == 1000000

    # textbook: O = [[10, 20], [30, 40]]; E = [[12,18],[28,42]]
    # chi2 = 4/12 + 4/18 + 4/28 + 4/42 = 0.79365...
    book = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 30 + [("r2", "c2")] * 40
    )
    r3 = chi2_independence(
        spark.createDataFrame(book, ["a", "b"]), "a", "b"
    ).collect()[0]
    expect = 4 / 12 + 4 / 18 + 4 / 28 + 4 / 42
    assert abs(r3["chi2_e6"] / 1e6 - expect) < 1e-5


def test_golden_record_survivorship(spark):
    from blueforty___etl_data_pipeline_spark.operators.aggregate import (
        golden_record,
    )

    rows = [
        # entity 1: phone arrives early, email arrives late with the
        # LATEST record carrying no phone — latest-row-wins would
        # lose the phone; survivorship must keep it
        (1, 10, "555-1", None),
        (1, 20, None, "a@x"),
        (1, 30, None, "b@x"),
        # entity 2: conflicting phones — freshest wins
        (2, 10, "111", None),
        (2, 40, "222", "c@y"),
        # entity 3: never observed either attribute
        (3, 5, None, None),
    ]
    df = spark.createDataFrame(
        rows, "ent long, ord long, phone string, email string"
    )
    got = {
        r["entity"]: r
        for r in golden_record(df, "ent", "ord", ["phone", "email"])
        .collect()
    }
    assert got[1]["phone"] == "555-1" and got[1]["email"] == "b@x"
    assert got[1]["n_records"] == 3
    assert got[1]["phone_n_obs"] == 1 and got[1]["email_n_obs"] == 2
    assert got[2]["phone"] == "222" and got[2]["email"] == "c@y"
    assert got[3]["phone"] is None and got[3]["phone_n_obs"] == 0


def test_sorted_neighborhood_pairs_match_bruteforce(spark):
    """sorted_neighborhood_pairs (round 11) must emit exactly the
    pairs within `window` rank positions of the (key ASC, id ASC)
    total order — checked against the brute-force rank self-join,
    including duplicate keys (tie-broken by id)."""
    from blueforty___etl_data_pipeline_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(6)) for i in range(37)]  # heavy dup keys
    df = spark.createDataFrame(rows, "cid long, k long")
    got = {
        (r["id_a"], r["id_b"], r["rank_distance"])
        for r in sorted_neighborhood_pairs(
            df, sort_col="k", id_col="cid", window=3
        ).collect()
    }
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    want = {
        (order[i][0], order[j][0], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + 4, len(order)))
    }
    assert got == want
