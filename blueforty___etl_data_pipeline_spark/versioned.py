"""Versioned tables: snapshot directories behind a manifest pointer —
the minimal time-travel core of every lakehouse format (Delta/Iceberg/
Hudi), format-agnostic: each version is an immutable directory
``v{N}/`` under the table root, and ``_manifest.json`` lists the live
versions.  Readers resolve the manifest, writers add a new snapshot
directory THEN extend the manifest (a reader never sees a half-written
version), vacuum deletes directories no longer referenced.

On a real lakehouse these calls collapse to the format's own snapshot
API; this module keeps identical semantics on any Hadoop-supported
filesystem so the rest of the engine (CDC diff, incremental recompute)
can be exercised against true multi-version storage.

All filesystem access goes through the Hadoop FileSystem API (the
``merge_upsert`` convention) — local paths in tests, object stores in
production, same code.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _read_manifest(spark: SparkSession, base_path: str) -> list[dict]:
    fs, hpath = _fs(spark, base_path)
    mp = hpath(base_path.rstrip("/") + "/" + _MANIFEST)
    if not fs.exists(mp):
        return []
    stream = fs.open(mp)
    try:
        # py4j passes byte[] by value, so stream.read(buf) cannot fill a
        # Python buffer — hand the stream to commons-io on the JVM side
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(
    spark: SparkSession, base_path: str, entries: list[dict]
) -> None:
    # Write-then-ATOMIC-OVERWRITE-rename so a concurrent reader sees
    # the old or the new manifest, never a partial one and never a
    # missing one.  FileContext.rename with Options.Rename.OVERWRITE
    # replaces the destination in a single namespace operation — the
    # delete-then-rename fallback (filesystems with no FileContext
    # support) leaves a tiny window where the manifest is absent, which
    # a reader observes as an empty table.
    #
    # Concurrency contract: single writer.  Reader-vs-writer is safe
    # (atomic pointer swap); concurrent WRITERS (or a writer racing
    # vacuum) are not coordinated — the manifest read-modify-write is
    # last-wins, exactly like a lakehouse table without a commit
    # service.  Multi-writer coordination belongs to a catalog/lock
    # layer above this module.
    fs, hpath = _fs(spark, base_path)
    root = base_path.rstrip("/")
    tmp = hpath(root + "/" + _MANIFEST + ".tmp")
    final = hpath(root + "/" + _MANIFEST)
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(entries).encode("utf-8"))
    finally:
        out.close()
    jvm = spark._jvm
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        opts = spark._sc._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, final, opts)
    except Exception:
        # e.g. a FileSystem with no AbstractFileSystem binding: fall
        # back to the non-atomic swap (documented window above)
        if fs.exists(final):
            fs.delete(final, False)
        fs.rename(tmp, final)


def write_version(
    spark: SparkSession,
    base_path: str,
    df: DataFrame,
    fmt: str = "parquet",
) -> int:
    """Write ``df`` as the next snapshot of the table at ``base_path``
    and return its version number (1-based).  The data directory is
    fully written before the manifest references it, so readers can
    never resolve an incomplete snapshot.  Each snapshot directory is
    immutable from this point on — time travel is a manifest lookup,
    not a file-level reconstruction."""
    entries = _read_manifest(spark, base_path)
    version = (max((e["version"] for e in entries), default=0)) + 1
    vdir = f"v{version}"
    root = base_path.rstrip("/")
    df.write.mode("errorifexists").format(fmt).save(root + "/" + vdir)
    entries.append({"version": version, "dir": vdir, "fmt": fmt})
    _write_manifest(spark, base_path, entries)
    return version


def list_versions(spark: SparkSession, base_path: str) -> list[int]:
    """Live version numbers, ascending."""
    return sorted(e["version"] for e in _read_manifest(spark, base_path))


def read_version(
    spark: SparkSession, base_path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot — ``version=None`` resolves to the latest.
    Raises ``ValueError`` for a version the manifest does not list
    (never written, or vacuumed away)."""
    entries = _read_manifest(spark, base_path)
    if not entries:
        raise ValueError(f"no versions at {base_path}")
    if version is None:
        entry = max(entries, key=lambda e: e["version"])
    else:
        matches = [e for e in entries if e["version"] == version]
        if not matches:
            raise ValueError(
                f"version {version} not in manifest at {base_path} "
                f"(live: {sorted(e['version'] for e in entries)})"
            )
        entry = matches[0]
    root = base_path.rstrip("/")
    return spark.read.format(entry["fmt"]).load(root + "/" + entry["dir"])


def diff_versions(
    spark: SparkSession,
    base_path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    cols: list[str] | None = None,
) -> DataFrame:
    """Row-level CDC between two live snapshots:
    (key_cols..., status ∈ added|removed|changed) via
    :func:`operators.profile.row_diff` — the change feed a downstream
    incremental consumer replays, computed from true persisted
    versions rather than in-flight DataFrames."""
    from .operators.profile import row_diff

    return row_diff(
        read_version(spark, base_path, v_old),
        read_version(spark, base_path, v_new),
        key_cols=key_cols,
        cols=cols,
    )


def wap_publish(
    spark: SparkSession,
    base_path: str,
    df: DataFrame,
    audit,
    fmt: str = "parquet",
) -> tuple[int | None, int]:
    """Write-Audit-Publish — the lakehouse release gate (Iceberg's WAP
    pattern): the snapshot is fully WRITTEN to a staging directory,
    the audit runs against the STAGED FILES (exactly the bytes readers
    would see, not the in-flight DataFrame), and only a clean audit
    promotes the directory into the manifest.  A dirty audit deletes
    the staging directory and publishes nothing — readers never
    observe a bad version, not even transiently.

    ``audit`` is a callable ``staged_df -> violations_df`` (e.g.
    :func:`operators.constraints.constraint_violations` filtered to
    nonzero counts); any returned row blocks the publish.

    Returns ``(version, 0)`` on publish or ``(None, n_violations)``
    on rejection.

    Scale shape: one write job + whatever the audit scans (typically
    the one aggregate pass of constraint_violations); the publish
    itself is a directory rename + manifest pointer swap — O(1) in
    data size, exactly like the underlying snapshot commit.
    """
    entries = _read_manifest(spark, base_path)
    version = (max((e["version"] for e in entries), default=0)) + 1
    root = base_path.rstrip("/")
    staging = f"{root}/_staging_v{version}"
    df.write.mode("errorifexists").format(fmt).save(staging)
    staged = spark.read.format(fmt).load(staging)
    n_violations = audit(staged).count()
    fs, hpath = _fs(spark, base_path)
    if n_violations:
        fs.delete(hpath(staging), True)
        return None, int(n_violations)
    vdir = f"v{version}"
    if not fs.rename(hpath(staging), hpath(f"{root}/{vdir}")):
        raise IOError(f"failed to promote staging dir to {vdir}")
    entries.append({"version": version, "dir": vdir, "fmt": fmt})
    _write_manifest(spark, base_path, entries)
    return version, 0


def vacuum(
    spark: SparkSession, base_path: str, keep_last: int = 1
) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshots (manifest
    updated FIRST, directories deleted after — a concurrent reader
    holding an old manifest copy may still finish its scan; one
    resolving fresh can no longer reach the doomed version).  Returns
    the removed version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    entries = sorted(
        _read_manifest(spark, base_path), key=lambda e: e["version"]
    )
    doomed, kept = entries[:-keep_last], entries[-keep_last:]
    if not doomed:
        return []
    _write_manifest(spark, base_path, kept)
    fs, hpath = _fs(spark, base_path)
    root = base_path.rstrip("/")
    for e in doomed:
        p = hpath(root + "/" + e["dir"])
        if fs.exists(p):
            fs.delete(p, True)
    return [e["version"] for e in doomed]
