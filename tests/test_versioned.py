"""Versioned tables: snapshot write/read/time-travel/diff/vacuum."""

from __future__ import annotations

import os

import pytest

from blueforty___etl_data_pipeline_spark.versioned import (
    diff_versions,
    list_versions,
    read_version,
    vacuum,
    write_version,
)


@pytest.fixture
def base(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_write_read_and_time_travel(spark, base):
    v1 = write_version(spark, base, _df(spark, [(1, "a"), (2, "b")]))
    v2 = write_version(spark, base, _df(spark, [(1, "a"), (2, "B"), (3, "c")]))
    assert (v1, v2) == (1, 2)
    assert list_versions(spark, base) == [1, 2]
    # latest
    assert {(r["k"], r["v"]) for r in read_version(spark, base).collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }
    # time travel
    assert {
        (r["k"], r["v"]) for r in read_version(spark, base, 1).collect()
    } == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError):
        read_version(spark, base, 7)


def test_diff_versions_is_row_level_cdc(spark, base):
    write_version(spark, base, _df(spark, [(1, "a"), (2, "b"), (4, "d")]))
    write_version(spark, base, _df(spark, [(1, "a"), (2, "B"), (3, "c")]))
    out = {
        r["k"]: r["status"]
        for r in diff_versions(spark, base, 1, 2, key_cols=["k"]).collect()
    }
    assert out == {2: "changed", 3: "added", 4: "removed"}


def test_vacuum_removes_old_snapshots_only(spark, base):
    write_version(spark, base, _df(spark, [(1, "a")]))
    write_version(spark, base, _df(spark, [(1, "b")]))
    write_version(spark, base, _df(spark, [(1, "c")]))
    removed = vacuum(spark, base, keep_last=1)
    assert removed == [1, 2]
    assert list_versions(spark, base) == [3]
    # the doomed directories are gone from disk, the kept one remains
    assert not os.path.isdir(os.path.join(base, "v1"))
    assert os.path.isdir(os.path.join(base, "v3"))
    with pytest.raises(ValueError):
        read_version(spark, base, 1)
    assert [r["v"] for r in read_version(spark, base).collect()] == ["c"]
    # vacuuming again is a no-op
    assert vacuum(spark, base, keep_last=1) == []


def test_snapshot_directories_are_immutable(spark, base):
    write_version(spark, base, _df(spark, [(1, "a")]))
    # a second write never touches v1 (errorifexists on the data dir)
    write_version(spark, base, _df(spark, [(1, "b")]))
    assert {
        r["v"] for r in read_version(spark, base, 1).collect()
    } == {"a"}


def test_wap_publish_gates_bad_snapshots(spark, tmp_path):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.versioned import (
        list_versions,
        read_version,
        wap_publish,
    )

    base = str(tmp_path / "wap")

    def audit(staged):
        return (
            staged.groupBy()
            .agg(
                F.count(F.when(F.col("v") < 0, 1)).alias("n_violations")
            )
            .filter(F.col("n_violations") > 0)
        )

    good = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    v, nv = wap_publish(spark, base, good, audit)
    assert (v, nv) == (1, 0)
    bad = spark.createDataFrame([(3, -5)], "k int, v int")
    v2, nv2 = wap_publish(spark, base, bad, audit)
    assert v2 is None and nv2 == 1
    # only the clean version is live; no staging debris readable
    assert list_versions(spark, base) == [1]
    assert sorted(
        (r["k"], r["v"]) for r in read_version(spark, base).collect()
    ) == [(1, 10), (2, 20)]
    # a later clean publish gets version 2 (the rejected attempt did
    # not burn a visible version number)
    v3, _ = wap_publish(spark, base, good, audit)
    assert v3 == 2 and list_versions(spark, base) == [1, 2]
