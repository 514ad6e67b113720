"""Scan-parallelism repair for compute-heavy passes over small inputs.

A parquet scan parallelizes at ROW-GROUP granularity: a table written
as one file with one row group is read by exactly one task no matter
how many cores the session has, and every expensive per-row expression
fused into that scan stage (hash folds, per-row vector math, shingle
explodes) runs serially while the rest of the cluster idles.  This is
the guide's §2.5 "input skew: one huge unsplittable file" case — the
prescribed fix is to repartition immediately after the read.

``spread_scan`` applies that fix ADAPTIVELY: it estimates the scan's
task count from the input files backing the frame (pure driver-side
metadata — no job, no plan materialization) and inserts a round-robin
repartition to the session's default parallelism ONLY when the scan is
starved relative to it.  At real scale the estimate exceeds the core
count and the frame is returned untouched — the exchange exists only
where it buys compute spread, so the helper is a no-op on the 100 TB
path by construction (nothing here is tuned to local mode).

Use it ONLY under operators whose results are partition-order
invariant (exact aggregates over integers/decimals, min/max/count,
windows with total deterministic ordering) — which is the engine's
standard contract anyway (every query hash-matches a sequential
oracle).  The keyless repartition itself is deterministic under task
retry: Spark sorts input rows before round-robin assignment
(``spark.sql.execution.sortBeforeRepartition``, on by default).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["spread_scan"]


def _local_size(uri: str) -> int:
    path = uri[7:] if uri.startswith("file://") else uri
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def spread_scan(df: DataFrame, min_rows_per_task: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism when its underlying scan cannot supply that many
    tasks; identity otherwise.

    The scan's achievable parallelism is estimated as
    ``max(n_files, total_bytes // maxPartitionBytes)`` — one task per
    file floor (row-group granularity; the engine's fixtures and
    sidecar tables are single-row-group), plus the split count for
    large files.  The estimate errs high for many-small-file tables
    (packing), which makes the helper conservatively skip — correct,
    since such scans are already parallel.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if par <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    total = sum(_local_size(f) for f in files)
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
        digits = "".join(ch for ch in raw if ch.isdigit())
        max_pb = int(digits) if digits else 128 << 20
    except Exception:
        max_pb = 128 << 20
    est_tasks = max(len(files), total // max_pb)
    if est_tasks >= par:
        return df
    return df.repartition(par)
