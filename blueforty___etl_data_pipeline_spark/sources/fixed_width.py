"""Fixed-width (positional) text source — the mainframe/COBOL-extract
format: no delimiters, every field a byte range, the oldest feed shape
still flowing into modern pipelines (and the one the reference's
positional COPY $1..$21 mapping is morally closest to — see
BlueForty.py:88-111 for the positional-field contract it mirrors).

Pure declarative Spark: ``spark.read.text`` → one ``substring`` per
field → trim + null-sentinel + type cast, all whole-stage codegen.
There is nothing to "parse" in Python, which is the point — a 100 TB
fixed-width feed scans at text-reader speed with column pruning on
the substring projections.

Layout spec: ``[(name, start_1based, width, dtype)]`` with dtypes
``string`` / ``long`` / ``date`` (ISO yyyy-mm-dd in-field) /
``decimal(p,s)``; numeric fields tolerate left-padding and the shared
NULL sentinels.  Overlapping or out-of-order ranges raise (layout
bugs surface loudly, not as silently shifted columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csv import NULL_SENTINELS


def write_fixed_width_line(values: list[str], widths: list[int]) -> str:
    """Fixture/export helper: left-justified, space-padded; a value
    wider than its field raises (fixed-width cannot spill)."""
    out = []
    for v, w in zip(values, widths):
        if len(v) > w:
            raise ValueError(f"value {v!r} exceeds field width {w}")
        out.append(v.ljust(w))
    return "".join(out)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, int, str]],
    skip_header_lines: int = 0,
) -> DataFrame:
    """Scan fixed-width files into a typed DataFrame per ``layout``."""
    pos = 0
    for name, start, width, _ in layout:
        if start < 1 or width < 1:
            raise ValueError(f"field {name}: 1-based start/width required")
        if start <= pos:
            raise ValueError(
                f"field {name}: overlaps or precedes the previous field"
            )
        pos = start + width - 1
    raw = spark.read.text(path)
    if skip_header_lines:
        # a labeled header row carries the first field's NAME in the
        # first field's byte range — the standard way to drop per-file
        # headers without per-file row indices (a count-based skip
        # would need a per-file window over the raw scan)
        if skip_header_lines != 1:
            raise ValueError("only 1 labeled header line supported")
        name0, start0, width0, _ = layout[0]
        raw = raw.filter(
            F.substring(F.col("value"), start0, width0)
            != F.lit(name0.ljust(width0)[:width0])
        )
    cols = []
    for name, start, width, dtype in layout:
        c = F.trim(F.substring(F.col("value"), start, width))
        c = F.when(
            c.isin(*NULL_SENTINELS) | (c == ""), None
        ).otherwise(c)
        if dtype == "string":
            cols.append(c.alias(name))
        elif dtype == "long":
            cols.append(c.cast("long").alias(name))
        elif dtype == "date":
            cols.append(F.to_date(c, "yyyy-MM-dd").alias(name))
        elif dtype.startswith("decimal"):
            cols.append(c.cast(dtype).alias(name))
        else:
            raise ValueError(f"unsupported dtype {dtype!r}")
    return raw.select(*cols)
