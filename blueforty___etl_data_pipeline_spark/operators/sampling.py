"""Deterministic sampling, split assignment, and per-group quotas for
training-data pipelines (north-star extension; BASELINE.json).

Everything here keys on a PORTABLE content hash (functions/text.md5_hash64)
instead of ``rand()``: at 100 TB a training split must be (a) reproducible
run-to-run, (b) stable under repartitioning, and (c) recomputable by any
engine auditing the corpus — none of which holds for RNG-based sampling.
``rand()`` also breaks Spark's task-retry determinism guarantees; a hash
of the row id cannot.

Reference provenance: the reference has no sampling surface — the closest
analog is its schema-inference row cap (BlueForty.py:286-288, sample 100
rows), which is a driver-side head, not a statistical sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash64

#: Hash-bucket resolution for fractions/splits: 1e-4 granularity.
_BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, _BUCKETS): md5 of ``salt:id``.  The salt
    decorrelates independent sampling decisions over the same ids (a
    90% keep-sample and a 1% eval-split must not share buckets)."""
    return (
        md5_hash64(F.concat(F.lit(salt + ":"), id_col.cast("string")))
        % _BUCKETS
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose salted id-hash
    bucket falls below the cutoff.  Shuffle-free scan filter; the same
    (id, salt) is kept or dropped identically on every run and engine."""
    cutoff = int(round(fraction * _BUCKETS))
    return df.filter(_bucket(F.col(id_col), salt) < cutoff)


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label (train/val/test by default,
    98/1/1) from contiguous ranges of the salted id-hash bucket.
    Pure map stage: no shuffle, no RNG, no driver state — each row's
    split is a function of its id alone, so late-arriving data lands in
    consistent splits and any engine can re-derive the assignment.

    Returns ``df`` plus a ``split`` column; weights are normalized.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    b = _bucket(F.col(id_col), salt)
    expr: Column | None = None
    hi = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        hi += w / total * _BUCKETS
        cond = b < F.lit(int(round(hi)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def quota_cap(
    df: DataFrame,
    group_col: str = "source",
    n: int = 100,
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Cap each group (domain/source/license bucket) at ``n`` rows,
    keeping a deterministic pseudo-random subset: rank rows inside the
    group by (salted id-hash, id) and keep the first ``n``.

    One shuffle on ``group_col``.  Skew note: a mega-domain makes one
    hot partition; for those, pre-filter with
    ``hash_sample(df, f)`` at a fraction that over-samples the cap
    (f ≈ 2n / est_group_size) before ranking — the window then runs on
    ~2n rows per group instead of the full group.
    """
    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    fraction of rows (the ``sampleBy`` shape, but hash-keyed instead of
    RNG so results are reproducible, repartition-stable, and
    recomputable by any engine).

    Strata absent from ``fractions`` keep ``default_fraction`` (0 drops
    them — the common "downsample the over-represented sources" use).
    Pure map-stage filter: no shuffle, no RNG, no driver state; the
    per-stratum cutoff is a small CASE expression, so this scales to
    any number of rows and any (bounded) number of strata.
    """
    b = _bucket(F.col(id_col), salt)
    cutoff: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    for stratum, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(frac * _BUCKETS))),
        ).otherwise(cutoff)
    return df.filter(b < cutoff)
