"""Sample-based CSV schema inference (SURVEY.md §1.3, F21/S8).

Reproduces the reference's sniffer exactly (BlueForty.py:239-297):

- read the header plus the first ``sample_rows`` (default 100) data rows
- strip null sentinels ``{None, '', 'NULL', '\\N'}`` per column
- assign the FIRST type in priority order DATE → INTEGER → FLOAT → STRING
  that parses *all* sampled values; all-null column → STRING
- date formats tried: ``%Y-%m-%d``, ``%m/%d/%Y``, ``%Y/%m/%d``
- column names taken verbatim from the header (case-sensitive — the
  reference's downstream joins depend on lowercase ``"supplierid"`` etc.,
  BlueForty.py:370-382)

Instead of generating a CREATE TABLE string (the reference's S8,
BlueForty.py:293-297) this returns a ``StructType`` to hand straight to the
reader.  Driver-side pure Python by design: it samples a bounded prefix of
one file, so it does not need to be distributed — the *load* that follows
is.
"""

from __future__ import annotations

import csv
import io
from datetime import datetime

from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: BlueForty.py:267
INFERENCE_NULL_SENTINELS = (None, "", "NULL", "\\N")

#: BlueForty.py:256
DATE_FORMATS = ("%Y-%m-%d", "%m/%d/%Y", "%Y/%m/%d")


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except (TypeError, ValueError):
        return False


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


def _is_date(s: str) -> bool:
    for fmt in DATE_FORMATS:
        try:
            datetime.strptime(s, fmt)
            return True
        except (TypeError, ValueError):
            pass
    return False


def infer_type(values: list[str | None]) -> DataType:
    """Priority-ordered type vote over sampled values
    (BlueForty.py:266-277)."""
    clean = [v for v in values if v not in INFERENCE_NULL_SENTINELS]
    if not clean:
        return StringType()
    if all(_is_date(v) for v in clean):
        return DateType()
    if all(_is_int(v) for v in clean):
        return LongType()
    if all(_is_float(v) for v in clean):
        return DoubleType()
    return StringType()


def infer_csv_schema(
    source: str | io.TextIOBase, sample_rows: int = 100
) -> StructType:
    """Infer a StructType from a CSV path or open text handle using the
    reference's 100-row-capped algorithm (BlueForty.py:280-297)."""
    if isinstance(source, str):
        with open(source, encoding="utf-8") as f:
            return infer_csv_schema(f, sample_rows)
    reader = csv.reader(source)
    headers = next(reader)
    samples: list[list[str]] = [[] for _ in headers]
    for i, row in enumerate(reader):
        if i >= sample_rows:
            break
        for j, value in enumerate(row[: len(headers)]):
            samples[j].append(value)
    return StructType(
        [
            StructField(h, infer_type(vals), nullable=True)
            for h, vals in zip(headers, samples)
        ]
    )
