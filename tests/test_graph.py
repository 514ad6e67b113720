"""Connected-components clustering over candidate pairs
(operators/graph.py — the LSH-pairs → dedup-groups resolution step)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.graph import (
    connected_components,
    dedup_near_duplicates,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: a diameter-3 chain — needs >1 propagation round.
    out = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_separate(spark):
    out = connected_components(
        _pairs(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    )
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_edge_direction_is_irrelevant(spark):
    # Pairs arrive with arbitrary orientation; symmetrization handles it.
    out = connected_components(_pairs(spark, [(5, 3), (3, 9), (9, 1)]))
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert set(got.values()) == {1}


def test_dedup_keeps_min_id_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 4)])  # cluster {1,2,4}
    kept = sorted(
        r["doc_id"] for r in dedup_near_duplicates(docs, pairs).collect()
    )
    # 0, 3, 5 unpaired; 1 survives for {1,2,4}.
    assert kept == [0, 1, 3, 5]


def test_empty_pairs_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(3)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [])
    assert dedup_near_duplicates(docs, pairs).count() == 3
