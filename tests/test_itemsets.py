"""Market-basket frequent pairs: metrics, dedup within basket, cap."""

from __future__ import annotations

from blueforty___etl_data_pipeline_spark.operators.itemsets import (
    frequent_pairs,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket_id long, item string")
    return {
        (r["item_a"], r["item_b"]): r
        for r in frequent_pairs(df, **kw).collect()
    }


def test_frequent_pairs_hand_computed_metrics(spark):
    # 4 baskets: {x,y} {x,y} {x} {y,z}; item x in 3, y in 3, z in 1
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "y"),  # duplicate item collapses
        (3, "x"),
        (4, "y"), (4, "z"),
    ]
    out = _run(spark, rows)
    xy = out[("x", "y")]
    assert xy["pair_count"] == 2
    assert xy["support_permille"] == 500          # 2/4
    assert xy["conf_a_to_b_permille"] == 666      # 2/3 floor
    assert xy["conf_b_to_a_permille"] == 666
    assert xy["lift_permille"] == 888             # 2*4*1000 // (3*3)
    yz = out[("y", "z")]
    assert yz["pair_count"] == 1
    assert yz["conf_b_to_a_permille"] == 1000     # z always with y
    assert yz["lift_permille"] == 1333            # 1*4*1000 // (3*1)
    assert ("x", "z") not in out


def test_frequent_pairs_support_floor_filters(spark):
    rows = [(1, "a"), (1, "b")] + [(10 + i, "c") for i in range(8)]
    # 9 baskets; pair (a,b) support = 1000//9 = 111 permille
    assert _run(spark, rows, min_support_permille=112) == {}
    assert list(_run(spark, rows, min_support_permille=111)) == [("a", "b")]


def test_frequent_pairs_basket_cap_drops_degenerate(spark):
    rows = [(1, f"i{k}") for k in range(5)] + [(2, "i0"), (2, "i1")]
    out = _run(spark, rows, max_basket_size=4)
    # basket 1 (5 items) dropped entirely; only basket 2's pair remains
    assert set(out) == {("i0", "i1")}
    assert out[("i0", "i1")]["support_permille"] == 1000


def test_frequent_pairs_randomized_vs_python_reference(spark):
    import itertools
    import random

    rng = random.Random(20260814)
    rows = []
    items = [f"i{k}" for k in range(7)]
    baskets = {}
    for b in range(40):
        chosen = rng.sample(items, rng.randint(1, 5))
        baskets[b] = set(chosen)
        rows += [(b, it) for it in chosen]
        # duplicate item mentions must collapse
        rows.append((b, chosen[0]))
    df = spark.createDataFrame(rows, "basket_id long, item string")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_count"],
            r["support_permille"],
            r["conf_a_to_b_permille"],
            r["conf_b_to_a_permille"],
            r["lift_permille"],
        )
        for r in frequent_pairs(df, min_support_permille=0).collect()
    }
    nb = len(baskets)
    counts = {}
    for s in baskets.values():
        for it in s:
            counts[it] = counts.get(it, 0) + 1
    expect = {}
    for a, b in itertools.combinations(sorted(items), 2):
        pc = sum(1 for s in baskets.values() if a in s and b in s)
        if pc:
            expect[(a, b)] = (
                pc,
                pc * 1000 // nb,
                pc * 1000 // counts[a],
                pc * 1000 // counts[b],
                pc * nb * 1000 // (counts[a] * counts[b]),
            )
    assert got == expect and expect
