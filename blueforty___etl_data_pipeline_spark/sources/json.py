"""JSON-lines source/sink with reference-style error tolerance.

The reference's loaders take an explicit error policy per format:
``ON_ERROR='CONTINUE'`` for CSV (skip bad rows, BlueForty.py:113) and
``ON_ERROR='ABORT_STATEMENT'`` for XML (fail the load, BlueForty.py:175).
This module gives the JSONL format the same two policies on Spark:

- ``on_error='continue'`` → PERMISSIVE parse with a corrupt-record
  column, then drop unparseable lines (they are counted, not silently
  lost, via :func:`read_jsonl_with_badlines`).
- ``on_error='abort'``    → FAILFAST: any malformed line fails the job.

Scale notes: JSONL is splittable by line, so a 100 TB directory scans
in parallel like CSV; an explicit schema avoids the full inference
pre-pass (schema inference reads the data TWICE — never at scale).
Parsing happens in the scan operator (JacksonParser inside codegen),
not in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Spark's internal name for the unparseable-line column.
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    on_error: str = "continue",
) -> DataFrame:
    """Read line-delimited JSON.  With ``on_error='continue'``,
    malformed lines are dropped (reference CSV semantics); with
    ``'abort'`` the first malformed line fails the read (reference XML
    semantics).  Explicit ``schema`` skips the inference pre-pass —
    always pass one at scale."""
    if on_error == "abort":
        reader = spark.read.option("mode", "FAILFAST")
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    if on_error != "continue":
        raise ValueError(f"on_error must be 'continue' or 'abort': {on_error}")
    df = _read_permissive(spark, path, schema)
    if CORRUPT_COL not in df.columns:  # every line parsed clean
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_jsonl_with_badlines(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read returning ``(good_rows, bad_lines)`` — the audit
    variant of ``on_error='continue'``: bad input is quarantined for
    inspection instead of dropped (one scan feeds both outputs).

    The parsed frame is cached: Spark refuses plans that read ONLY the
    corrupt-record column from a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching
    is the documented escape hatch.  That makes this the bounded-load
    audit path; for corpus-scale ingestion use :func:`read_jsonl` and
    write the quarantine with one pass over the cached batch."""
    df = _read_permissive(spark, path, schema).cache()
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0).select(
            F.lit(None).cast("string").alias(CORRUPT_COL)
        ).limit(0)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def _read_permissive(
    spark: SparkSession, path: str, schema: StructType | None
) -> DataFrame:
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        # The corrupt column must be part of the declared schema or
        # PERMISSIVE has nowhere to put the raw line.
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
        return reader.schema(full).json(path)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """Write line-delimited JSON (one object per line, splittable).
    ``compression='gzip'|'zstd'`` trades CPU for scan bandwidth —
    prefer zstd for archival corpora, none for shuffle-adjacent temps."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
