"""cut_lineage: reliable checkpoint dispatch (PLANS.md round-14 task).

Every iterative graph operator cuts lineage through
``lineage.cut_lineage``.  In single-JVM local mode that is
``localCheckpoint`` (blocks on executors); when the SparkContext has a
checkpoint directory configured — the multi-executor deployment path —
the cut MUST become a reliable ``checkpoint`` (files in the checkpoint
dir survive executor loss mid-iteration).

The reliable path needs its own SparkContext because
``setCheckpointDir`` is sticky global state on the shared test session,
so it runs in a fresh subprocess and the results are compared against
the shared session's localCheckpoint run.
"""

from __future__ import annotations

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (7, 8)]


def test_cut_lineage_dispatches_local_without_checkpoint_dir(spark):
    """No checkpoint dir (the shared test session): cut_lineage must
    call localCheckpoint, never reliable checkpoint."""
    from pyspark.sql.classic.dataframe import DataFrame

    from blueforty___etl_data_pipeline_spark.lineage import cut_lineage

    assert spark.sparkContext.getCheckpointDir() is None

    calls: list[str] = []
    orig_local = DataFrame.localCheckpoint
    orig_reliable = DataFrame.checkpoint

    def spy_local(self, eager=True, storageLevel=None):
        calls.append("local")
        return orig_local(self, eager=eager)

    def spy_reliable(self, eager=True):
        calls.append("reliable")
        return orig_reliable(self, eager=eager)

    DataFrame.localCheckpoint = spy_local
    DataFrame.checkpoint = spy_reliable
    try:
        out = cut_lineage(spark.range(5))
        assert out.count() == 5
    finally:
        DataFrame.localCheckpoint = orig_local
        DataFrame.checkpoint = orig_reliable
    assert calls == ["local"]


_RELIABLE_SCRIPT = """
import json
import os
import sys

sys.path.insert(0, {repo!r})

from blueforty___etl_data_pipeline_spark.session import get_spark

spark = get_spark(
    app_name="lineage-reliable", master="local[2]", shuffle_partitions=4
)
spark.sparkContext.setLogLevel("ERROR")
ckpt_dir = sys.argv[1]
spark.sparkContext.setCheckpointDir(ckpt_dir)

from blueforty___etl_data_pipeline_spark.operators import graph as g

edges = spark.createDataFrame({edges!r}, "src long, dst long")
pairs = edges.toDF("id_a", "id_b")

comps = sorted(
    (r.node, r.component_id)
    for r in g.connected_components(pairs, max_iter=6).collect()
)
ranks = sorted(
    (r.node, r.rank_e9)
    for r in g.pagerank_fixed_point(edges, iterations=3).collect()
)
# Proof the RELIABLE path ran: reliable checkpoint writes rdd-*
# directories under the checkpoint dir (localCheckpoint writes nothing).
ckpt_files = []
for root, _dirs, files in os.walk(ckpt_dir):
    ckpt_files.extend(os.path.join(root, f) for f in files)
print(json.dumps({{
    "comps": comps,
    "ranks": ranks,
    "n_ckpt_files": len(ckpt_files),
}}))
spark.stop()
"""


@pytest.mark.slow
def test_cut_lineage_reliable_path_identical_results(spark, tmp_path):
    """Fresh subprocess session WITH a checkpoint dir: the iterative
    operators must take the reliable checkpoint path (files appear in
    the dir) and produce results identical to the localCheckpoint run
    in the shared session."""
    from blueforty___etl_data_pipeline_spark.operators import graph as g

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    pairs = edges.toDF("id_a", "id_b")
    expect_comps = sorted(
        (r.node, r.component_id)
        for r in g.connected_components(pairs, max_iter=6).collect()
    )
    expect_ranks = sorted(
        (r.node, r.rank_e9)
        for r in g.pagerank_fixed_point(edges, iterations=3).collect()
    )

    ckpt_dir = str(tmp_path / "ckpt")
    script = _RELIABLE_SCRIPT.format(repo=REPO, edges=EDGES)
    proc = subprocess.run(
        [sys.executable, "-c", script, ckpt_dir],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEMORY": "2g"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])

    assert [tuple(t) for t in got["comps"]] == expect_comps
    assert [tuple(t) for t in got["ranks"]] == expect_ranks
    # The reliable checkpoint actually materialized to the dir.
    assert got["n_ckpt_files"] > 0
