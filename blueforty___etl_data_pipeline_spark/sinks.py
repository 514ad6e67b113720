"""Materialization sinks (SURVEY.md §2.1, S9/S10).

The reference materializes three CTAS tables (BlueForty.py:425-448,
:452-463, :467-475) and appends shredded rows via INSERT INTO … SELECT
(:179-201).  Spark-native equivalents:

- ``write_table``: CTAS — overwrite a Parquet location (or a catalog
  table), optionally Hive-partitioned.  Partitioning by the
  filename-derived yyyy/mm columns (sources/csv.with_filename_partition)
  turns the reference's hand-rolled ``purchases/yyyy/mm/`` stage layout
  (BlueForty.py:66-75) into real partitions that Catalyst prunes.
- ``insert_append``: INSERT INTO … SELECT — append to an existing
  location/table with schema-by-name resolution.

Scale notes: one file per task — control output file count with
``repartition_cols`` (repartition by the partition columns so each Hive
partition is written by few tasks, avoiding the many-small-files problem
at 1000 executors).  ``maxRecordsPerFile`` can be layered on via option.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    repartition_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """CTAS to a path (BlueForty.py:425-448 analog).

    ``repartition_cols`` defaults to ``partition_by`` when partitioning:
    co-locating rows of one output partition into one shuffle partition
    keeps file counts bounded (≤ shuffle partitions per Hive partition
    instead of tasks × partitions).
    """
    if partition_by and repartition_cols is None:
        repartition_cols = list(partition_by)
    if repartition_cols:
        df = df.repartition(*repartition_cols)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    if partition_by:
        # Zero-row schema sidecar: a PARTITIONED save of an empty
        # frame (a routinely-empty partition-pruned slice upstream)
        # writes NO data files, so a later read of `path` has nothing
        # to infer a schema from.  The sidecar always carries the full
        # row schema (partition columns as data columns); read_back
        # prefers it — which also skips footer-based schema inference
        # on large tables.  Underscore-prefixed, so data scans of
        # `path` ignore it.
        df.limit(0).write.mode("overwrite").format(fmt).save(
            f"{path.rstrip('/')}/_schema"
        )


def save_as_table(
    df: DataFrame,
    name: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """CTAS into the session catalog (managed table) — the closest analog
    of ``CREATE OR REPLACE TABLE … AS SELECT`` when a metastore exists."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets``
    hash buckets on ``bucket_cols`` at WRITE time, sorted within buckets.

    Joins and aggregations between tables bucketed the same way on the
    same key skip their shuffle entirely (the plan shows SortMergeJoin
    with no Exchange — asserted in tests).  At 100 TB this converts the
    most expensive recurring cost — re-shuffling a fact table for every
    join — into a one-time write-side cost."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def insert_append(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """INSERT INTO … SELECT (BlueForty.py:179-201 analog): append rows to
    an existing dataset.  Schema resolution is by name (Parquet), so
    column order in ``df`` need not match the target.  ``partition_by``
    MUST match the target's layout — appending unpartitioned files into a
    partitioned dataset corrupts the read-back schema."""
    writer = df.write.mode("append").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Re-open a materialized table (round-trip helper for tests/bench).

    Prefers the ``_schema`` sidecar written by :func:`write_table` for
    partitioned tables: an empty partitioned table has no data files
    (schema inference fails without it), and on large tables the
    explicit schema skips footer-based inference.  Falls back to
    normal inference for tables written without a sidecar."""
    reader = spark.read.format(fmt)
    try:
        sidecar = (
            spark.read.format(fmt)
            .load(f"{path.rstrip('/')}/_schema")
            .schema
        )
        reader = reader.schema(sidecar)
    except Exception:
        pass
    return reader.load(path)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    fmt: str = "parquet",
) -> DataFrame:
    """MERGE INTO (upsert) without a table format that supports it:
    read target ∪ updates, keep the latest row per key, rewrite.

    Semantics: for each key, the row with the greatest ``order_col``
    wins; within a tie the UPDATE side wins (matching MERGE ... WHEN
    MATCHED THEN UPDATE).  New keys are inserted, existing keys are
    replaced — a full CDC-compaction step.

    Plan: one window ranking partitioned by key — a single shuffle of
    target+updates.  At 100 TB the rewrite should be bounded: partition
    the target (e.g. by date) and call this per affected partition
    (dynamic partition overwrite), so only partitions containing
    updated keys are read and rewritten; the ranking shape is identical.
    Returns the merged DataFrame re-read from ``target_path``.

    The new snapshot is written to a staging directory and swapped in
    with two filesystem renames (the snapshot-pointer pattern every
    lakehouse format uses) — never an in-place overwrite of files the
    merge plan is still reading, and no driver/executor materialization
    of the merged data.  On Delta/Iceberg/Hudi this whole function
    collapses to a real ``MERGE INTO`` with file-level skipping; this
    is the format-agnostic fallback with identical row-level semantics.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gen = (
        Window.partitionBy(*key_cols)
        .orderBy(F.desc(order_col), F.desc("_is_update"))
    )
    target = spark.read.format(fmt).load(target_path)
    cols = target.columns
    unioned = target.withColumn("_is_update", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_is_update", F.lit(1))
    )
    merged = (
        unioned.withColumn("_rn", F.row_number().over(gen))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )
    staging = target_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").format(fmt).save(staging)
    # Atomic-ish swap via the Hadoop FileSystem API (works on any
    # supported FS; on object stores a lakehouse format's metadata
    # pointer replaces these renames).
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    old = hpath(target_path.rstrip("/") + ".old")
    if fs.exists(old):
        fs.delete(old, True)
    fs.rename(hpath(target_path), old)
    fs.rename(hpath(staging), hpath(target_path))
    fs.delete(old, True)
    return spark.read.format(fmt).load(target_path)


def write_table_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "object"] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict[str, object]:
    """CTAS with load metrics measured DURING the write pass (Spark's
    ``observe`` API): row count plus any caller-supplied aggregate
    expressions ride the write job itself — no second scan, no race
    with concurrent writers, the numbers describe exactly the rows
    written.

    This is the engine-side version of the reference's manual row-count
    checkpoints (BlueForty.py:234, :449, :464, :476): instead of a
    human comment, every load can assert its expected row count from
    the returned dict.

    Returns the observed metrics as a plain dict.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    exprs = {"n_rows": F.count(F.lit(1)).alias("n_rows")}
    for name, col in (metrics or {}).items():
        exprs[name] = col.alias(name) if hasattr(col, "alias") else col
    obs = Observation("write_metrics")
    observed = df.observe(obs, *exprs.values())
    observed.write.mode(mode).format(fmt).save(path)
    return dict(obs.get)


def delete_rows(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys,
    partition_col: str,
) -> int:
    """Targeted hard delete (GDPR / right-to-be-forgotten) from a
    Hive-partitioned Parquet location: rewrite ONLY the partitions that
    contain the doomed keys, via dynamic partition overwrite.

    ``keys`` is either a small Python sequence (GDPR-sized request
    lists → an ``isin`` filter that pushes down to the scan) or a
    DataFrame whose first column holds the doomed keys (bulk deletes →
    a distributed anti-join; the key set never touches the driver, so
    the join is NOT broadcast-hinted here — AQE picks broadcast on its
    own when the key set turns out small, and falls back to a shuffle
    join when it is the bulk case this overload exists for).

    Two passes: (1) a partition-pruned probe finds the affected
    partition values (the collect is bounded by the partition count,
    never row count); (2) the surviving rows of JUST those partitions
    are rewritten — untouched partitions keep their files byte-for-byte
    (pytest asserts this on mtimes).  At 100 TB this is the difference
    between rewriting gigabytes and rewriting the lake; the same shape
    is what table formats call copy-on-write delete.

    Dynamic partition overwrite only replaces partitions PRESENT in the
    written data, so a hit partition whose every row is doomed would
    survive untouched — a silent delete failure.  Those fully-doomed
    partitions are removed explicitly through the Hadoop FileSystem API
    after the rewrite.

    Returns the number of partitions rewritten or removed.
    """
    from pyspark.sql import functions as F

    tgt = spark.read.parquet(path)
    if isinstance(keys, DataFrame):
        doomed = keys.select(
            F.col(keys.columns[0]).alias(key_col)
        ).distinct()
        hit = tgt.join(doomed, on=key_col, how="left_semi")
        doom_filter = None
    else:
        doomed = None
        hit = tgt.filter(F.col(key_col).isin(list(keys)))
        doom_filter = ~F.col(key_col).isin(list(keys))
    hit_parts = [
        r[0] for r in hit.select(partition_col).distinct().collect()
    ]
    if not hit_parts:
        return 0
    in_hit = tgt.filter(F.col(partition_col).isin(hit_parts))
    if doomed is not None:
        survivors = in_hit.join(doomed, on=key_col, how="left_anti")
    else:
        survivors = in_hit.filter(doom_filter)
    # Partitions where EVERY row is doomed produce no survivor rows, so
    # dynamic overwrite will not rewrite them — list them now (bounded
    # by partition count) and drop their directories afterwards.
    live_parts = {
        r[0] for r in survivors.select(partition_col).distinct().collect()
    }
    (
        survivors.repartition(*[partition_col])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    remove_partition_dirs(
        spark,
        path,
        partition_col,
        [p for p in hit_parts if p not in live_parts],
    )
    return len(hit_parts)


def remove_partition_dirs(
    spark: SparkSession,
    path: str,
    partition_col: str,
    parts: Sequence,
) -> None:
    """Drop the Hive partition directories for ``parts`` under ``path``.

    Directory names use Hive path escaping ('%3A' for ':', etc.);
    built with Spark's OWN escaper so the delete hits exactly the
    directory the writer created, even for values with spaces, slashes
    or colons.  NULL partition values land in the Hive
    default-partition directory.  Shared by ``delete_rows`` (fully-
    doomed partitions, which dynamic overwrite cannot express) and
    ``plans.incremental`` (removed-partition cleanup).
    """
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    jvm = spark.sparkContext._jvm
    catalog_utils = (
        jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    )
    for part in parts:
        if part is None:
            dirname = f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
        else:
            dirname = (
                f"{catalog_utils.escapePathName(partition_col)}"
                f"={catalog_utils.escapePathName(str(part))}"
            )
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{dirname}")
        fs = p.getFileSystem(hadoop_conf)
        if fs.exists(p):
            fs.delete(p, True)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    files_per_partition: int = 1,
) -> None:
    """Small-file compaction: rewrite each Hive partition of a Parquet
    location into ``files_per_partition`` files (bin-packing the
    streaming/append debris that accumulates at ingest).

    One shuffle keyed on the partition column re-clusters rows so each
    output partition is written by exactly ``files_per_partition``
    tasks; dynamic partition overwrite swaps partitions atomically-ish
    (per-partition), never rewriting unlisted partitions.  Run this as
    the maintenance job between ingest and query — scan cost at read
    time drops with file count (fewer footers, bigger row groups).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    salt_mod = max(1, int(files_per_partition))
    # Repartitioning on (partition value [, deterministic row-hash salt])
    # sends every output partition to exactly `files_per_partition`
    # writer tasks.  The salt is a hash of the full row — deterministic
    # under retries, unlike spark_partition_id().
    keys = [F.col(partition_col)]
    if salt_mod > 1:
        keys.append(
            F.pmod(
                F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
                F.lit(salt_mod),
            )
        )
    (
        df.repartition(*keys)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    sort_cols: Sequence[str],
    n_files: int | None = None,
) -> None:
    """Cluster-by + sort-within-files layout: all rows of a cluster key
    land in ONE file, ordered by ``sort_cols`` inside it — the layout
    that makes per-key history reads sequential (a user's event
    timeline, a document's chunks) and run-length-friendly for
    columnar encoding.

    ``repartition(hash(cluster))`` co-locates each key;
    ``sortWithinPartitions`` orders inside each task's file without any
    global sort.  This is the write-side complement of
    ``write_bucketed``: bucketing serves shuffle-free JOINS via catalog
    metadata, clustering serves sequential per-key SCANS with plain
    files any reader can consume.
    """
    from pyspark.sql import functions as F

    out = df.repartition(
        *([n_files] if n_files else []), F.col(cluster_col)
    ).sortWithinPartitions(cluster_col, *sort_cols)
    out.write.mode("overwrite").parquet(path)


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_col: str,
    shard_col: str = "shard_id",
    suffix: str = ".txt",
) -> DataFrame:
    """WebDataset-style tar shard export — the de-facto container for
    large multimodal training corpora (one tar per shard, one file
    per sample, sequential-read friendly; loaders stream shards, so
    shard count = read parallelism on the training side).

    Each ``shard_col`` group becomes ``shard-{id:06d}.tar`` under
    ``out_dir``, members sorted by key and written BYTE-DETERMINISTIC
    (USTAR format, zeroed mtime/uid/gid/uname, mode 0644): the same
    input always produces the identical tar, so shard bytes are
    content-addressable and re-runs are idempotent overwrites.

    Returns the shard manifest (shard_id, n_items, payload_bytes,
    tar_bytes).  USTAR arithmetic makes ``tar_bytes`` an exact
    function of the member sizes — 512-byte header plus payload
    padded to 512 per member, 1024-byte end marker, stream padded to
    the 10240-byte record size — so an external engine can verify the
    manifest without reading a single tar (the hash-checkable-sink
    pattern of ``clustered_write``/``observed_write``).

    Scale shape: one ``applyInPandas`` group per shard writes
    sequentially; shards are independent, so a 1000-executor cluster
    writes 1000 shards concurrently with zero coordination.
    """
    import pandas as pd

    schema = (
        f"{shard_col} int, n_items long, payload_bytes long, "
        "tar_bytes long"
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import os
        import tarfile

        pdf = pdf.sort_values(key_col)
        shard_id = int(pdf[shard_col].iloc[0])
        buf = io.BytesIO()
        payload_total = 0
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = (
                    payload
                    if isinstance(payload, (bytes, bytearray))
                    else str(payload).encode("utf-8")
                )
                info = tarfile.TarInfo(name=f"{int(key):08d}{suffix}")
                info.size = len(data)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
                payload_total += len(data)
        blob = buf.getvalue()
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".shard-{shard_id:06d}.tmp")
        final = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, final)  # atomic overwrite, idempotent re-runs
        return pd.DataFrame(
            [[shard_id, len(pdf), payload_total, len(blob)]],
            columns=[shard_col, "n_items", "payload_bytes", "tar_bytes"],
        )

    return df.groupBy(shard_col).applyInPandas(write_shard, schema)


def parquet_footer_stats(spark: SparkSession, path: str) -> DataFrame:
    """Data-skipping audit: per-(file, row group, column) statistics
    read from PARQUET FOOTERS ONLY — no data pages are decoded.

    This is the report that tells you whether a layout actually skips
    at 100 TB: a predicate can prune a row group iff its footer
    [min, max] excludes the value, so footer stats that match the
    true column extrema (and nulls that are actually counted) are the
    contract the clustered/Z-order writers are buying.  The check
    that footer stats EQUAL recomputed truth is exactly what the
    oracle does to this report's aggregate.

    Distributed: binaryFile scan → pyarrow ``ParquetFile`` per task —
    footer parsing fans out with the file listing, the way a catalog
    stats-collection job runs.  Returns (file, row_group, column,
    n_rows, n_nulls, min_val, max_val) with values stringified (one
    schema for all column types).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
    )

    def read_footers(batches):
        import io

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                pf = pq.ParquetFile(io.BytesIO(bytes(content)))
                for rg in range(pf.metadata.num_row_groups):
                    g = pf.metadata.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        st = col.statistics
                        rows.append(
                            (
                                fpath,
                                rg,
                                col.path_in_schema,
                                g.num_rows,
                                None if st is None else st.null_count,
                                None if st is None or not st.has_min_max
                                else str(st.min),
                                None if st is None or not st.has_min_max
                                else str(st.max),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "column", "n_rows",
                    "n_nulls", "min_val", "max_val",
                ],
            )

    return files.select("path", "content").mapInPandas(
        read_footers,
        schema=(
            "file string, row_group int, column string, n_rows long, "
            "n_nulls long, min_val string, max_val string"
        ),
    )
