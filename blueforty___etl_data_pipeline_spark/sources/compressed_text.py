"""Compressed text-lines source: gzip / xz / bzip2, dispatched by
MAGIC BYTES (never by filename) — the long tail of dataset drops is
``.jsonl.gz`` / ``.jsonl.xz`` / ``.txt.bz2``, and Spark's built-in
line reader only transparently handles the codecs Hadoop ships
(gzip/bzip2); LZMA/xz — the codec research corpora actually favor
for its ratio — is not among them.  All three decompressors are
stdlib (``gzip``/``lzma``/``bz2``).

Scale shape: these are NON-SPLITTABLE whole-stream codecs, so the
honest parallelism is one file per task (``binaryFile``), the same
contract the corpus-drop layout already follows (many ~100 MB
shards).  Decompress + line-split happen inside the Arrow batch;
zero shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_MAGICS = (
    (b"\x1f\x8b", "gzip"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"BZh", "bzip2"),
)


def sniff_compression(data: bytes) -> str:
    """'gzip' | 'xz' | 'bzip2' | 'none' from leading magic bytes."""
    for magic, name in _MAGICS:
        if data[: len(magic)] == magic:
            return name
    return "none"


def decompress_auto(data: bytes) -> bytes:
    """Whole-stream decompress by sniffed codec; 'none' passes
    through.  Truncated streams raise (corrupt shard = data loss,
    never silently-short output)."""
    kind = sniff_compression(data)
    if kind == "gzip":
        import gzip

        return gzip.decompress(data)
    if kind == "xz":
        import lzma

        return lzma.decompress(data)
    if kind == "bzip2":
        import bz2

        return bz2.decompress(data)
    return data


def write_compressed_lines(path: str, lines: list[str], codec: str) -> int:
    """Serialize lines (LF-joined, UTF-8) under ``codec`` ∈
    {gzip, xz, bzip2, none}; deterministic bytes (gzip mtime 0).
    Returns the byte count written."""
    raw = ("\n".join(lines) + "\n").encode("utf-8")
    if codec == "gzip":
        import gzip

        blob = gzip.compress(raw, mtime=0)
    elif codec == "xz":
        import lzma

        blob = lzma.compress(raw, preset=6)
    elif codec == "bzip2":
        import bz2

        blob = bz2.compress(raw)
    elif codec == "none":
        blob = raw
    else:
        raise ValueError(f"unknown codec {codec!r}")
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def read_compressed_lines(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed compressed-lines ingest: (file, codec, line_no,
    line) — one non-splittable file per task, magic-dispatched
    decompress, LF split (trailing newline dropped)."""
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
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                kind = sniff_compression(data)
                text = decompress_auto(data).decode("utf-8")
                name = os.path.basename(path)
                parts = text.split("\n")
                if parts and parts[-1] == "":
                    parts.pop()  # trailing newline, not an empty record
                for i, line in enumerate(parts):
                    rows.append((name, kind, i, line))
            yield pd.DataFrame(
                rows, columns=["file", "codec", "line_no", "line"]
            )

    return files.select("path", "content").mapInPandas(
        run,
        schema="file string, codec string, line_no int, line string",
    )
