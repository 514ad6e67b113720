"""Fellegi–Sunter record linkage: scoring, missing fields, block cap."""

from __future__ import annotations

from blueforty___etl_data_pipeline_spark.operators.linkage import (
    record_linkage,
)


def _sides(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "left_id long, blk string, name string, band long"
    )
    right = spark.createDataFrame(
        right_rows, "right_id long, blk string, name string, band long"
    )
    return left, right


def test_linkage_scores_and_mask(spark):
    left, right = _sides(
        spark,
        [(1, "a", "ALICE", 5), (2, "a", "BOB", 7)],
        [(10, "a", "ALICE", 5), (20, "a", "BOB", 9), (30, "b", "BOB", 7)],
    )
    out = {
        (r["left_id"], r["right_id"]): (r["score_milli"], r["agree_mask"])
        for r in record_linkage(
            left,
            right,
            block_cols=["blk"],
            compare_weights=[("name", 4000, -1000), ("band", 1500, -500)],
        ).collect()
    }
    # block 'a' pairs only — 30 (block 'b') never becomes a candidate
    assert out == {
        (1, 10): (5500, "11"),
        (1, 20): (-1500, "00"),
        (2, 10): (-1500, "00"),
        (2, 20): (3500, "10"),
    }


def test_linkage_missing_field_contributes_neither_weight(spark):
    left, right = _sides(
        spark,
        [(1, "a", None, 5)],
        [(10, "a", "ALICE", 5)],
    )
    [r] = record_linkage(
        left,
        right,
        block_cols=["blk"],
        compare_weights=[("name", 4000, -1000), ("band", 1500, -500)],
    ).collect()
    assert (r["score_milli"], r["agree_mask"]) == (1500, "-1")


def test_linkage_threshold_filters(spark):
    left, right = _sides(
        spark,
        [(1, "a", "ALICE", 5), (2, "a", "BOB", 7)],
        [(10, "a", "ALICE", 5), (20, "a", "CAROL", 7)],
    )
    out = record_linkage(
        left,
        right,
        block_cols=["blk"],
        compare_weights=[("name", 4000, -1000), ("band", 1500, -500)],
        threshold_milli=2000,
    ).collect()
    assert {(r["left_id"], r["right_id"]) for r in out} == {(1, 10)}


def test_linkage_block_cap_drops_degenerate_block(spark):
    # block 'big' has 3 left rows (> cap 2) — all its pairs vanish;
    # block 'ok' is untouched.
    left, right = _sides(
        spark,
        [(i, "big", f"N{i}", i) for i in range(3)] + [(9, "ok", "X", 1)],
        [(10 + i, "big", f"N{i}", i) for i in range(2)] + [(19, "ok", "X", 1)],
    )
    out = record_linkage(
        left,
        right,
        block_cols=["blk"],
        compare_weights=[("name", 4000, -1000)],
        max_block_size=2,
    ).collect()
    assert {(r["left_id"], r["right_id"]) for r in out} == {(9, 19)}


def test_linkage_randomized_vs_python_reference(spark):
    import random

    rng = random.Random(99)
    weights = [("f1", 3000, -700), ("f2", 1200, -400)]
    lrows, rrows = [], []
    for i in range(60):
        blk = f"b{rng.randint(0, 4)}"
        lrows.append((i, blk, f"n{rng.randint(0, 9)}", rng.randint(0, 3)))
    for j in range(60):
        blk = f"b{rng.randint(0, 4)}"
        rrows.append((1000 + j, blk, f"n{rng.randint(0, 9)}",
                      rng.randint(0, 3)))
    left = spark.createDataFrame(
        lrows, "left_id long, blk string, f1 string, f2 long"
    )
    right = spark.createDataFrame(
        rrows, "right_id long, blk string, f1 string, f2 long"
    )
    got = {
        (r["left_id"], r["right_id"]): (r["score_milli"], r["agree_mask"])
        for r in record_linkage(
            left, right, block_cols=["blk"], compare_weights=weights
        ).collect()
    }
    expect = {}
    for li, lb, lf1, lf2 in lrows:
        for ri, rb, rf1, rf2 in rrows:
            if lb != rb:
                continue
            score, mask = 0, ""
            for lv, rv, (_, ag, dis) in (
                (lf1, rf1, weights[0]),
                (lf2, rf2, weights[1]),
            ):
                if lv == rv:
                    score += ag
                    mask += "1"
                else:
                    score += dis
                    mask += "0"
            expect[(li, ri)] = (score, mask)
    assert got == expect and expect


def test_blocking_eval_reduction_vs_completeness(spark):
    from blueforty___etl_data_pipeline_spark.operators.linkage import (
        blocking_eval,
    )

    # 4 left rows in 2 blocks; right has 2 true partners, one of which
    # lands in the WRONG block (completeness 500); candidates 2x1 + 2x1
    left = spark.createDataFrame(
        [(1, 1, "b0"), (2, 2, "b0"), (3, 3, "b1"), (4, 4, "b1")],
        "lid long, truth long, blk string",
    )
    right = spark.createDataFrame(
        [(101, 1, "b0"), (103, 3, "b0")],  # 3's partner misblocked
        "rid long, truth long, blk string",
    )
    r = blocking_eval(left, right, block_col="blk", truth_col="truth").collect()[0]
    assert (r["n_left"], r["n_right"]) == (4, 2)
    assert r["n_candidates"] == 4      # block b0: 2 left x 2 right
    assert r["n_true"] == 2
    assert r["n_true_in_blocks"] == 1
    assert r["reduction_ratio_permille"] == 500   # 4 of 8 pairs avoided
    assert r["pair_completeness_permille"] == 500


def test_fellegi_sunter_weights_hand_case(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.linkage import (
        fellegi_sunter_weights,
    )

    # 4 match pairs (name agrees 3/4), 6 non-match (name agrees 1/6)
    rows = (
        [(True, True)] * 3 + [(True, False)] * 1
        + [(False, True)] * 1 + [(False, False)] * 5
    )
    df = spark.createDataFrame(rows, "is_match boolean, nm_agree boolean")
    out = fellegi_sunter_weights(df, "is_match", ["nm_agree"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_match"], r["n_unmatch"]) == (4, 6)
    assert (r["agree_match"], r["agree_unmatch"]) == (3, 1)
    m = (3 + 0.5) / (4 + 1.0)
    u = (1 + 0.5) / (6 + 1.0)
    assert r["w_agree_e6"] == math.floor(1e6 * math.log(m / u))
    assert r["w_disagree_e6"] == math.floor(
        1e6 * math.log((1 - m) / (1 - u))
    )
    # an informative field separates: agree weight +, disagree -
    assert r["w_agree_e6"] > 0 > r["w_disagree_e6"]
