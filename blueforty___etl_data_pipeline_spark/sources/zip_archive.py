"""Generic ZIP-archive source — the container sibling of the tar-based
WebDataset reader (``sources/webdataset.py``) for datasets shipped as
``.zip`` shards (scraped-site dumps, Kaggle-style exports, OOXML
families beyond docx/xlsx).

Writer and reader are both pure stdlib (``zipfile``), like every codec
in this engine.  The writer is byte-deterministic: STORED entries (no
compression, so member payloads stay seekable and integrity is byte
equality), fixed DOS timestamp, fixed external attributes — the same
blob for the same inputs on every run, which is what makes zip shards
content-addressable in a 100 TB lake.

Scale shape: ``binaryFile`` yields one row per archive (shards are
sized to fit one worker by construction — the same contract as
WebDataset tar shards), then an Arrow-batched ``mapInPandas`` opens
each archive via the CENTRAL DIRECTORY (one seek, no full-file scan
per member) and emits one row per member.  No shuffle: extraction
pipelines with the scan.

Reference parity: the reference pipeline (BlueForty.py) has no archive
surface; this extends the source family (S1-S7 in SURVEY §2) the same
way the WARC/WebDataset readers do.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed DOS timestamp for deterministic output (zip's epoch floor)
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def write_zip(entries: list[tuple[str, bytes]]) -> bytes:
    """One deterministic ZIP blob from (member_name, payload) pairs:
    STORED (uncompressed) entries, epoch-pinned timestamps, zeroed
    attributes.  Raises on duplicate member names — a zip with
    duplicate names extracts differently across tools, which is silent
    data loss in a pipeline."""
    names = [n for n, _ in entries]
    if len(set(names)) != len(names):
        raise ValueError("duplicate member names in zip entries")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, payload in entries:
            zi = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zi.external_attr = 0
            zi.create_system = 0
            z.writestr(zi, payload)
    return buf.getvalue()


def parse_zip_members(data: bytes) -> list[tuple[str, int, int, bytes]]:
    """Central-directory walk of one archive → one tuple per member:
    (name, compressed_size, crc32, payload).  The CRC is the archive's
    own integrity word — surfacing it lets a verification query prove
    payload integrity without re-hashing."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        out = []
        for zi in z.infolist():
            if zi.is_dir():
                continue
            out.append(
                (zi.filename, zi.compress_size, zi.CRC, z.read(zi))
            )
        return out


def read_zip(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed ZIP-shard scan → one row per member:
    ``(archive, name, n_bytes, crc32, payload)``.  One task per
    archive (binaryFile row), members extracted executor-side in an
    Arrow-batched ``mapInPandas`` — zero exchange."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator) -> Iterator:
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for name, _csize, crc, payload in parse_zip_members(
                    bytes(content)
                ):
                    rows.append(
                        (
                            os.path.basename(path),
                            name,
                            len(payload),
                            crc,
                            payload,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["archive", "name", "n_bytes", "crc32", "payload"],
            )

    return files.select("path", "content").mapInPandas(
        run,
        schema=(
            "archive string, name string, n_bytes long, crc32 long, "
            "payload binary"
        ),
    )


def write_zip_shards(
    df: DataFrame,
    out_dir: str,
    name_col: str,
    payload_col: str,
    shard_col: str,
) -> None:
    """Materialize (name, payload) rows as one ``.zip`` per shard key
    under ``out_dir`` — the export twin of :func:`read_zip`.  Rows are
    sorted by name INSIDE each shard so shard bytes are deterministic
    regardless of upstream partitioning."""
    import os

    def write_one(pdf):
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame({"shard": [], "n_members": []})
        shard = str(pdf[shard_col].iloc[0])
        pairs = sorted(
            zip(pdf[name_col], pdf[payload_col]), key=lambda p: p[0]
        )
        blob = write_zip(
            [(str(n), bytes(p)) for n, p in pairs]
        )
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{shard}.zip"), "wb") as f:
            f.write(blob)
        return pd.DataFrame({"shard": [shard], "n_members": [len(pairs)]})

    (
        df.select(shard_col, name_col, payload_col)
        .groupBy(shard_col)
        .applyInPandas(write_one, schema="shard string, n_members long")
        .collect()  # |shards| rows — the manifest, not data
    )
