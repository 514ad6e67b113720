"""WebDataset tar-shard READER — the ingest twin of
``sinks.write_webdataset_shards``.

WebDataset is the de-facto sharded container for large multimodal
training corpora: a dataset is a directory of ``.tar`` files, each
member file named ``{key}.{ext}``; all members sharing a key form one
SAMPLE (``000123.jpg`` + ``000123.txt`` + ``000123.json`` …), and the
extension describes the modality.  Loaders stream whole shards, so
the natural Spark parallelism is one task per shard.

Scale shape: ``binaryFile`` gives one row per tar (shards are sized
to O(100 MB)–O(1 GB) by construction, exactly so that one fits in one
worker's memory — that is the format's own contract), then an
Arrow-batched ``mapInPandas`` walks each tar with the stdlib
``tarfile`` reader and emits one row per member.  No shuffle: member
extraction pipelines with the scan, and sample reassembly (pivot by
extension) is the caller's groupBy on ``key`` only when actually
needed.

Reference parity: the reference pipeline (BlueForty.py) has no tar
surface; this completes the engine's WebDataset loop (export via
``sinks.write_webdataset_shards``, ingest here).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read WebDataset tar shards → one row per member:
    ``(shard, name, key, ext, payload, size)`` where ``key`` is the
    member basename up to the FIRST dot and ``ext`` everything after
    it (the WebDataset sample-grouping convention, so ``x.seg.png``
    keeps the compound extension ``seg.png``)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator) -> Iterator:
        import io
        import os
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(path)
                with tarfile.open(
                    fileobj=io.BytesIO(blob), mode="r"
                ) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        name = os.path.basename(info.name)
                        key, _, ext = name.partition(".")
                        payload = tar.extractfile(info).read()
                        rows.append(
                            (shard, name, key, ext, bytearray(payload),
                             len(payload))
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "name", "key", "ext", "payload", "size",
                ],
            )

    return files.select("path", "content").mapInPandas(
        run,
        schema=(
            "shard string, name string, key string, ext string, "
            "payload binary, size long"
        ),
    )


def assemble_samples(members: DataFrame) -> DataFrame:
    """Group a member relation back into SAMPLES: one row per
    (shard, key) with ``exts`` (sorted list of member extensions),
    ``n_members`` and ``total_bytes`` — the integrity view a loader
    checks before training (every sample complete, no orphan
    modalities).  One hash-partial groupBy on (shard, key)."""
    return members.groupBy("shard", "key").agg(
        F.array_sort(F.collect_list("ext")).alias("exts"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("size").alias("total_bytes"),
    )
