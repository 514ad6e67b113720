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
