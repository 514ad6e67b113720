"""Lineage truncation for iterative operators.

Every iterative operator in this engine (connected components,
PageRank, label propagation, BFS, HITS, transitive closure, k-means,
BPE merges, ...) must cut its logical plan each round: without a cut
the plan grows by two joins per iteration, Catalyst re-analyzes the
whole nested tree every round (round-12 post-mortem: six phases of
joins + broadcast cross-joins OOMed analysis on a 1 GiB driver), and a
failure re-executes from the original source.

``cut_lineage`` is the one place that decides HOW the cut happens:

- **Reliable ``checkpoint`` when a checkpoint dir is configured.**
  ``DataFrame.checkpoint`` writes the materialized partitions to the
  fault-tolerant checkpoint location (HDFS / object storage on a real
  cluster).  This is the multi-executor deployment path: a lost
  executor re-reads the checkpoint files and the job continues.
- **``localCheckpoint`` otherwise.**  Blocks are stored on executors
  only (memory-and-disk) — cheap and exactly right for single-JVM
  local mode (tests, bench), but an executor loss kills the job, so a
  cluster deployment should always ``spark.sparkContext
  .setCheckpointDir(...)`` and get the reliable path with no code
  change.

Both forms truncate the plan identically; results are byte-identical
(asserted by ``tests/test_lineage.py`` in a fresh subprocess session
with a checkpoint dir set).

Reference provenance: the reference (BlueForty.py) has no iterative
operator — it delegates query execution to a warehouse.  This module
exists for the engine's north-star extensions (graph dedup, PageRank,
BPE training) where iteration is inherent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["cut_lineage"]


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s logical plan, materializing it as a new source.

    Uses reliable ``checkpoint`` when ``sparkContext`` has a checkpoint
    directory configured (the multi-executor deployment path), else
    ``localCheckpoint`` (single-JVM local mode).  ``eager=False``
    defers materialization to first use — for frames that feed exactly
    one downstream action, the lazy form avoids a separate
    materialization job.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
