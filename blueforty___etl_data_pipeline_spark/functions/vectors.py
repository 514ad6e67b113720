"""Vector primitives over ``array<float>`` embedding columns.

Dot products and norms are built from ``zip_with`` + ``aggregate`` — a
sequential left fold in index order, so the floating-point result is
deterministic (same bits every run, and reproducible by any engine that
sums in list order — the DuckDB oracle does).  This is the JVM-side path;
the batched NumPy path for brute-force ANN lives in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in index order, computed in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖); null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
