"""Z-order (Morton) curve encoding for multi-dimensional data clustering.

Sorting a table by the bit-interleaved z-value of two columns clusters
rows so that EVERY interleaved dimension has a narrow min/max span per
file — which is exactly what Parquet row-group/file statistics need to
skip data under predicates on EITHER column (the one-column sort only
skips on the sort key).  This is the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; here it is plain column math + a range
repartition, no table format required.

The encoding is pure integer bit arithmetic (shifts, masks, adds), so
it is engine-portable — the DuckDB oracle computes identical z-values.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1.

    Expression size is O(bits); stays inside whole-stage codegen.
    Inputs are masked to ``bits`` bits, so out-of-range values wrap
    rather than corrupt the interleave.
    """
    mask = (1 << bits) - 1
    xm = x.cast("bigint").bitwiseAND(F.lit(mask))
    ym = y.cast("bigint").bitwiseAND(F.lit(mask))
    one = F.lit(1)
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(one), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(one), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` z-clustered on (x_col, y_col): range-partition by
    the z-value into ``n_files`` writer tasks and sort within each, so
    consecutive files cover consecutive z-ranges.  Predicates on either
    column then prune most files from their min/max footer stats.

    One range shuffle at write time buys every subsequent scan's
    skipping — the standard write-once/read-many trade.
    """
    z = zorder_value(F.col(x_col), F.col(y_col), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value(df: DataFrame, x_col: str, y_col: str,
                  bits: int = 12, out_col: str = "h") -> DataFrame:
    """Hilbert-curve index of two non-negative ints (low ``bits``
    bits) — the locality-tighter sibling of :func:`zorder_value`:
    consecutive Hilbert values are ALWAYS spatially adjacent (Morton
    takes long diagonal jumps at power-of-two boundaries), so
    range-partitioned files get even narrower per-file min/max spans
    on both dimensions.  This is the curve Delta chose for its
    OPTIMIZE clustering for exactly that reason.

    The classic iterative xy→d algorithm (one rotate/reflect step per
    bit, MSB first) unrolls into ``bits`` chained column projections
    — pure integer CASE/shift arithmetic, whole-stage-codegen-able,
    and reproduced bit-for-bit by the DuckDB oracle's identical
    unrolled SQL.  Returns ``df`` with the ``out_col`` bigint column.
    """
    mask = (1 << bits) - 1
    out = df.withColumn("_hx", F.col(x_col).cast("bigint").bitwiseAND(F.lit(mask)))
    out = out.withColumn("_hy", F.col(y_col).cast("bigint").bitwiseAND(F.lit(mask)))
    out = out.withColumn(out_col, F.lit(0).cast("bigint"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        out = out.withColumn("_rx", rx).withColumn("_ry", ry)
        out = out.withColumn(
            out_col,
            F.col(out_col)
            + F.lit(s).cast("bigint") * F.lit(s)
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")).cast("bigint"),
        )
        # rotate/reflect the quadrant so the next level nests correctly
        nx = F.when(
            F.col("_ry") == 0,
            F.when(
                F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")
            ).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            F.col("_ry") == 0,
            F.when(
                F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")
            ).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        out = out.withColumn("_nx", nx).withColumn("_ny", ny)
        out = out.withColumn("_hx", F.col("_nx")).withColumn(
            "_hy", F.col("_ny")
        )
    return out.drop("_hx", "_hy", "_rx", "_ry", "_nx", "_ny")
