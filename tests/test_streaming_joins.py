"""Stream-stream and stream-static joins driven end-to-end with
availableNow triggers (streaming/joins.py)."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
)

SCHEMA = "ts timestamp, user_id long, kind string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)


def _t(s):
    return datetime(2026, 1, 1, 12, 0, 0).replace(minute=s)


def test_stream_stream_join_within_lag(spark, tmp_path):
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    # impressions at minute 0 and 30; clicks at minutes 10, 50, and 45
    # for another user.
    _write(spark, lp, [(_t(0), 1, "imp"), (_t(30), 1, "imp")])
    _write(
        spark,
        rp,
        [(_t(10), 1, "click"), (_t(50), 1, "click"), (_t(45), 2, "click")],
    )
    left = spark.readStream.schema(SCHEMA).parquet(lp)
    right = spark.readStream.schema(SCHEMA).parquet(rp)
    joined = stream_stream_join(
        left, right, key="user_id", max_lag="INTERVAL 30 MINUTES"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["ts"].minute, r["ts_r"].minute)
        for r in spark.sql("SELECT ts, ts_r FROM ss_join").collect()
    )
    # imp@0 matches click@10 (within 30m); imp@30 matches click@50;
    # click@10 is NOT within (30, 60] of imp@30; user 2 never matches.
    assert got == [(0, 10), (30, 50)]


def test_stream_stream_join_batch_mode_same_semantics(spark, tmp_path):
    lp, rp = str(tmp_path / "lb"), str(tmp_path / "rb")
    _write(spark, lp, [(_t(0), 1, "imp")])
    _write(spark, rp, [(_t(10), 1, "click"), (_t(45), 1, "click")])
    out = stream_stream_join(
        spark.read.parquet(lp),
        spark.read.parquet(rp),
        key="user_id",
        max_lag="INTERVAL 30 MINUTES",
    ).collect()
    assert len(out) == 1 and out[0]["ts_r"].minute == 10


def test_stream_static_join_enriches_per_batch(spark, tmp_path):
    sp = str(tmp_path / "s")
    _write(spark, sp, [(_t(0), 1, "imp"), (_t(1), 9, "imp")])
    dim = spark.createDataFrame(
        [(1, "paid")], "user_id long, segment string"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(sp)
    out = stream_static_join(stream, dim, on="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_static")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["segment"]
        for r in spark.sql("SELECT user_id, segment FROM ss_static").collect()
    }
    assert got == {1: "paid", 9: None}  # left join keeps unmatched


@pytest.mark.slow
def test_stream_stream_left_outer_emission_boundary(spark, tmp_path):
    """leftOuter: an unmatched left row emits (null right) iff the
    FINAL watermark strictly passes left_ts + lag.  Pins the strict
    inequality at the knife edge (ts + lag == watermark stays in
    state, unemitted) — the eviction contract the streaming_outer_join
    oracle encodes."""
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    # watermark (delay 0) = min(max left ts, max right ts) = minute 50.
    # left@0: +30 = 30 < 50  -> emits unmatched
    # left@20: +30 = 50 == 50 -> knife edge, stays in state
    # left@55: +30 = 85 > 50 -> stays in state
    _write(
        spark, lp, [(_t(0), 1, "imp"), (_t(20), 1, "imp"), (_t(55), 1, "imp")]
    )
    # the only click is another user's: sets the right watermark only
    _write(spark, rp, [(_t(50), 2, "click")])
    left = spark.readStream.schema(SCHEMA).parquet(lp)
    right = spark.readStream.schema(SCHEMA).parquet(rp)
    joined = stream_stream_join(
        left,
        right,
        key="user_id",
        watermark="0 seconds",
        max_lag="INTERVAL 30 MINUTES",
        how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(
        (r["ts"].minute, r["user_id_r"]) for r in spark.table("ss_outer").collect()
    )
    assert got == [(0, None)]


@pytest.mark.slow
def test_streaming_state_shapes_in_executed_plans(spark, tmp_path):
    """State-shape pins for the streaming family (VERDICT r10 item 7):
    PLANS.md claims the stream-stream join runs as
    StreamingSymmetricHashJoin with watermark-bounded state — assert
    it from the EXECUTED micro-batch plan (q.explain after the drain),
    not the unresolved logical plan, so a refactor that silently
    degrades to a stateless or unbounded form fails here."""
    import contextlib
    import io

    lp, rp = str(tmp_path / "sl"), str(tmp_path / "sr")
    _write(spark, lp, [(_t(0), 1, "imp")])
    _write(spark, rp, [(_t(10), 1, "click")])
    left = spark.readStream.schema(SCHEMA).parquet(lp)
    right = spark.readStream.schema(SCHEMA).parquet(rp)
    joined = stream_stream_join(
        left, right, key="user_id", max_lag="INTERVAL 30 MINUTES"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_state_shape")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain()
    plan = buf.getvalue()
    q.stop()
    assert "StreamingSymmetricHashJoin" in plan, plan
    # the join condition carries the event-time range bound — that is
    # what lets the state store evict (O(rate × lag) state, never the
    # whole stream)
    assert "watermark" in plan.lower(), plan
    # state metrics confirm both sides kept bounded keyed state
    progress = q.lastProgress
    ops = progress["stateOperators"]
    assert ops and ops[0]["operatorName"] == "symmetricHashJoin", ops
