"""Incremental recompute: re-run a transform over ONLY the partitions
whose content changed between two snapshots.

The nightly reality of a 100 TB lake is that almost nothing changed
since yesterday.  ``operators/profile.partition_fingerprints`` digests
each partition into (n_rows, order-independent multiset hash) with one
COUNT-GROUP-BY-cost pass; diffing two digests yields the work list.
This module closes the loop: filter the new snapshot to the
added/changed partitions, run the (partition-closed) transform over
just that slice, dynamic-partition-overwrite the derived table, and
drop derived outputs of removed partitions.

Contract: ``transform`` must be PARTITION-CLOSED — its output rows for
partition value p may depend only on input rows with that value, and it
must carry ``partition_col`` through to its output (per-partition aggs,
per-partition cleaning/enrichment, map-side scoring all qualify; global
joins/windows do not — run those on the full-recompute path instead).

Scale shape: two fingerprint passes (each a partial-agged shuffle keyed
on the partition value), a full-outer join over the tiny digest tables,
ONE collect bounded by |changed partitions|, and a transform run whose
input is the changed slice only — at 1000 executors, the difference
between touching 3 partitions and re-deriving the lake.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import changed_partitions, partition_fingerprints
from ..sinks import remove_partition_dirs


def incremental_recompute(
    spark: SparkSession,
    new_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    partition_col: str,
    out_path: str,
    old_df: DataFrame | None = None,
) -> list[tuple]:
    """Bring the derived table at ``out_path`` up to date with
    ``new_df`` by recomputing only changed work.

    ``old_df`` is the previous snapshot (None ⇒ first run: everything
    is 'added').  Returns the work list as
    ``[(partition, status, rows_old, rows_new), …]`` — empty means the
    derived table was already current and nothing was touched.
    """
    fp_new = partition_fingerprints(new_df, partition_col)
    if old_df is None:
        work_df = fp_new.select(
            F.col(partition_col),
            F.lit("added").alias("status"),
            F.lit(None).cast("long").alias("rows_old"),
            F.col("n_rows").alias("rows_new"),
        )
    else:
        work_df = changed_partitions(
            partition_fingerprints(old_df, partition_col),
            fp_new,
            partition_col,
        )
    # Bounded by |changed partitions| — never row count.
    work = [tuple(r) for r in work_df.collect()]
    todo = [r[0] for r in work if r[1] in ("added", "changed")]
    removed = [r[0] for r in work if r[1] == "removed"]
    if todo:
        out = transform(new_df.filter(F.col(partition_col).isin(todo)))
        if partition_col not in out.columns:
            raise ValueError(
                f"transform must carry {partition_col!r} through "
                "(partition-closed contract)"
            )
        (
            out.repartition(partition_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(out_path)
        )
    if removed:
        remove_partition_dirs(spark, out_path, partition_col, removed)
    return work


def merge_aggregate(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental ADDITIVE-aggregate maintenance: the stored state at
    ``state_path`` holds (keys, n_rows, sum_<col>…); folding in a new
    batch costs one partial aggregation of the BATCH plus a re-merge
    against the (aggregate-sized) state — history is never rescanned.
    This is the rollup-table complement of :func:`incremental_recompute`
    (which re-derives changed partitions; this folds append-only
    deltas).

    Only decomposable aggregates belong here (COUNT/SUM fold by
    addition — and from them AVG at read time); non-decomposable
    metrics (exact medians, distinct counts) need the recompute path
    or a mergeable sketch (see approx_profile).

    The new state is staged and swapped with filesystem renames (the
    merge_upsert snapshot pattern) so a concurrent reader never sees a
    half-written state.  Returns the merged state DataFrame.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum(c).cast("long").alias(f"sum_{c}") for c in sum_cols
    ]
    part = batch.groupBy(*keys).agg(*aggs)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(state_path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    if fs.exists(hpath(state_path)):
        state = spark.read.parquet(state_path)
        merged = (
            state.unionByName(part)
            .groupBy(*keys)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").cast("long").alias(f"sum_{c}")
                    for c in sum_cols
                ],
            )
        )
    else:
        merged = part
    staging = state_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    old = hpath(state_path.rstrip("/") + ".old")
    if fs.exists(old):
        fs.delete(old, True)
    if fs.exists(hpath(state_path)):
        fs.rename(hpath(state_path), old)
    fs.rename(hpath(staging), hpath(state_path))
    fs.delete(old, True)
    return spark.read.parquet(state_path)
