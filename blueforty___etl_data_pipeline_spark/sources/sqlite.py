"""SQLite database-file source — the other ubiquitous single-file
table container (app exports, research datasets, scraped-data dumps
all ship as .sqlite/.db).  The stdlib ``sqlite3`` module IS the
reference implementation binding, so ingest is exact and
dependency-free.

Scale shape: one database file per task (``binaryFile`` scan — the
format is a single file by construction, the same per-file
parallelism contract as Avro/XLSX/WARC here), each task materializes
its blob to task-local scratch (SQLite requires a seekable file; the
bytes never cross the network twice) and cursors the requested table
out through Arrow batches.  Zero shuffle — rows pipeline straight
from the B-tree walk into the downstream stage.

- :func:`write_sqlite` — fixture builder: a real database file via
  the stdlib driver (schema + rows), deterministic page layout for a
  fixed insert order.
- :func:`read_sqlite` — distributed reader: one DataFrame row per
  table row across all matched files.
- :func:`sqlite_tables` — driver-side catalog probe of one file
  (table names + row counts) for ingest planning.

Reference parity: the reference pipeline reads Postgres via a
CSV detour (BlueForty.py:312-360); SQLite extends the same
"database file as source" surface without a server.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


def write_sqlite(path: str, table: str, columns: list[str], rows) -> int:
    """Create a real SQLite database at ``path`` holding ``table``
    with TEXT/INTEGER/REAL affinity inferred by the driver; returns
    the row count.  Overwrites any existing file (idempotent
    fixtures)."""
    import os
    import sqlite3

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        col_sql = ", ".join(f'"{c}"' for c in columns)
        ph = ", ".join("?" for _ in columns)
        con.execute(f'CREATE TABLE "{table}" ({col_sql})')
        n = 0
        for r in rows:
            con.execute(f'INSERT INTO "{table}" VALUES ({ph})', r)
            n += 1
        con.commit()
    finally:
        con.close()
    return n


def sqlite_tables(data: bytes) -> list[tuple[str, int]]:
    """Catalog probe of one database blob: [(table, n_rows), ...]
    sorted by name.  Validates the 16-byte header magic first so a
    non-SQLite file fails by name, not with a driver error."""
    import os
    import sqlite3
    import tempfile

    if data[:16] != b"SQLite format 3\x00":
        raise ValueError("not a SQLite database (bad header magic)")
    fd, tmp = tempfile.mkstemp(suffix=".sqlite")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        con = sqlite3.connect(tmp)
        try:
            names = [
                r[0]
                for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table' "
                    "ORDER BY name"
                )
            ]
            return [
                (n, con.execute(f'SELECT COUNT(*) FROM "{n}"').fetchone()[0])
                for n in names
            ]
        finally:
            con.close()
    finally:
        os.remove(tmp)


def read_sqlite(
    spark: SparkSession,
    path_glob: str,
    table: str,
    columns: list[str],
) -> DataFrame:
    """Distributed SQLite ingest: every matched database file yields
    its ``table`` rows (projected to ``columns``, returned as strings
    for schema stability across mixed-affinity files — cast
    downstream) plus the source ``file`` name.  One file per task;
    blobs hit task-local scratch once."""
    import os

    base, leaf = os.path.split(path_glob)
    if any(c in leaf for c in "*?["):
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", leaf)
            .load(base)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    col_sql = ", ".join(f'"{c}"' for c in columns)

    def run(batches: Iterator) -> Iterator:
        import sqlite3
        import tempfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:16] != b"SQLite format 3\x00":
                    raise ValueError(
                        f"{path}: not a SQLite database (bad magic)"
                    )
                fd, tmp = tempfile.mkstemp(suffix=".sqlite")
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(data)
                    con = sqlite3.connect(tmp)
                    try:
                        for r in con.execute(
                            f'SELECT {col_sql} FROM "{table}"'
                        ):
                            rows.append(
                                (os.path.basename(path),)
                                + tuple(
                                    None if v is None else str(v)
                                    for v in r
                                )
                            )
                    finally:
                        con.close()
                finally:
                    os.remove(tmp)
            yield pd.DataFrame(
                rows, columns=["file"] + list(columns)
            )

    schema = "file string, " + ", ".join(f"{c} string" for c in columns)
    return files.select("path", "content").mapInPandas(run, schema=schema)
