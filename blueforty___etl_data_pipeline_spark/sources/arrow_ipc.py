"""Arrow IPC file source/sink (Feather V2) — the interchange format
the Python data ecosystem hands around (pandas/polars/duckdb all
read/write it zero-copy), and the natural landing format for
Arrow-native feature pipelines.

pyarrow is already the engine's Arrow bridge (every ``mapInPandas``
stage rides it), so the reader here is exact and dependency-free in
this environment: ``binaryFile`` scan (one IPC file per task — the
format is a self-contained footer-indexed container) →
``pa.ipc.open_file`` over the blob → record batches → pandas →
rows.  Zero shuffle; batches pipeline into the downstream stage.

The reader validates the ``ARROW1`` magic before touching pyarrow so
non-IPC files fail by name, and projects the requested columns only
(columnar pruning at the deserialization layer — the IPC footer
indexes record batches, so unrequested columns are never
materialized).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

ARROW_MAGIC = b"ARROW1"


def write_arrow_ipc(path: str, table) -> int:
    """Write a pyarrow Table as an IPC file (Feather V2 layout);
    returns the row count.  Fixture/export helper."""
    import pyarrow as pa

    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
    return table.num_rows


def arrow_ipc_schema(data: bytes) -> list[tuple[str, str]]:
    """[(column, dtype), ...] from the IPC footer of one blob."""
    import io

    import pyarrow as pa

    if data[:6] != ARROW_MAGIC:
        raise ValueError("not an Arrow IPC file (missing ARROW1 magic)")
    reader = pa.ipc.open_file(io.BytesIO(data))
    return [(f.name, str(f.type)) for f in reader.schema]


def read_arrow_ipc(
    spark: SparkSession, path_glob: str, columns: list[str]
) -> DataFrame:
    """Distributed Arrow IPC ingest: every matched file yields its
    rows projected to ``columns`` (strings for cross-file schema
    stability — cast downstream), plus the source ``file``."""
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

    def run(batches: Iterator) -> Iterator:
        import io

        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            frames = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:6] != ARROW_MAGIC:
                    raise ValueError(
                        f"{path}: not an Arrow IPC file (bad magic)"
                    )
                reader = pa.ipc.open_file(io.BytesIO(data))
                tbl = reader.read_all().select(columns)
                # to_pylist, not to_pandas: pandas would coerce
                # nullable ints to float NaN and stringify as 'nan'
                f = pd.DataFrame(
                    {
                        c: [
                            None if v is None else str(v)
                            for v in tbl.column(c).to_pylist()
                        ]
                        for c in columns
                    }
                )
                f.insert(0, "file", os.path.basename(path))
                frames.append(f)
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=["file"] + list(columns))
            )

    schema = "file string, " + ", ".join(f"{c} string" for c in columns)
    return files.select("path", "content").mapInPandas(run, schema=schema)
