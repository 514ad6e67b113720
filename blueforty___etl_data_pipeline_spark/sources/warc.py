"""WARC (Web ARChive, ISO 28500) source/sink — the Common Crawl
container, i.e. THE on-disk format a web-scale LLM text corpus starts
from.

A crawl is published as tens of thousands of independent ``.warc``
files; the natural Spark shape is therefore FILE-level parallelism —
every executor parses whole files, no intra-file splitting (records
are length-prefixed by ``Content-Length`` headers, so there is no
robust mid-file sync point; this matches how real CC jobs shard).  At
the Common Crawl convention of ~1 GB per file, per-task memory stays
bounded and a 1000-executor cluster drains 64k files with zero
coordination.

- :func:`write_warc_shards` — deterministic exporter (fixture + real
  sink): one WARC file per shard group via ``applyInPandas``, each
  opening with a ``warcinfo`` record, then one ``response`` record per
  row with spec-correct version line, named headers, and
  ``Content-Length``-framed payloads; byte-deterministic (fixed date,
  digest-derived record IDs) so re-runs are idempotent overwrites.
- :func:`read_warc` — distributed parser: ``binaryFile`` scan →
  Arrow-batched record walk honoring ``Content-Length`` (payloads may
  legally contain ``WARC/1.0`` — naive splitting is wrong), returning
  one row per record with type, target URI, date, and payload stats.

The reference pipeline (BlueForty.py) ingests CSV/XML/JDBC only; this
extends the engine's source surface to the web-corpus container.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

_CRLF = "\r\n"
_DATE = "2020-01-01T00:00:00Z"


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0" + _CRLF
    head += "".join(f"{k}: {v}{_CRLF}" for k, v in headers)
    head += f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
    return head.encode("utf-8") + payload + (_CRLF * 2).encode()


def _fake_uuid(seed: str) -> str:
    h = hashlib.md5(seed.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    uri_cols: tuple[str, ...] = ("source",),
    shard_col: str = "shard_id",
) -> DataFrame:
    """Write one ``shard-{id:06d}.warc`` per shard group; returns the
    shard manifest (shard_id, n_records, payload_bytes, warc_bytes)."""
    import pandas as pd

    schema = (
        f"{shard_col} int, n_records long, payload_bytes long, "
        "warc_bytes long"
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import os

        pdf = pdf.sort_values(key_col)
        shard_id = int(pdf[shard_col].iloc[0])
        blob = bytearray(
            _record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Date", _DATE),
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:{_fake_uuid(f'info-{shard_id}')}>",
                    ),
                    ("Content-Type", "application/warc-fields"),
                ],
                f"software: engine-warc-writer/1.0{_CRLF}".encode(),
            )
        )
        payload_total = 0
        for _, row in pdf.iterrows():
            key = int(row[key_col])
            path = "/".join(str(row[c]) for c in uri_cols)
            payload = str(row[text_col]).encode("utf-8")
            payload_total += len(payload)
            blob += _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Date", _DATE),
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:{_fake_uuid(f'rec-{key}')}>",
                    ),
                    (
                        "WARC-Target-URI",
                        f"https://corpus.example/{path}/{key}",
                    ),
                    ("Content-Type", "text/plain"),
                ],
                payload,
            )
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".shard-{shard_id:06d}.tmp")
        final = os.path.join(out_dir, f"shard-{shard_id:06d}.warc")
        with open(tmp, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, final)
        return pd.DataFrame(
            [[shard_id, len(pdf), payload_total, len(blob)]],
            columns=[shard_col, "n_records", "payload_bytes", "warc_bytes"],
        )

    return df.groupBy(shard_col).applyInPandas(write_shard, schema)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Walk one WARC file's records via ``Content-Length`` framing."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError(f"unterminated record header at byte {pos}")
        head = data[pos:end].decode("utf-8")
        lines = head.split(_CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad version line at byte {pos}: {lines[0]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing Content-Length at byte {pos}") from e
        body_start = end + 4
        if body_start + clen > n:
            raise ValueError("payload overruns file")
        payload = data[body_start : body_start + clen]
        records.append(
            {
                "warc_type": hdrs.get("warc-type", ""),
                "record_id": hdrs.get("warc-record-id", ""),
                "target_uri": hdrs.get("warc-target-uri"),
                "warc_date": hdrs.get("warc-date", ""),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return records


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC scan: one input file per task via
    ``binaryFile``, records exploded in an Arrow-batched stage.

    Returns (file, warc_type, record_id, target_uri, warc_date,
    content_length, payload_bytes) — payload itself stays binary-free
    here (stats only); callers needing bodies re-read with a projector.
    """
    import os

    # glob-in-path triggers Spark's (benign but noisy) FileStreamSink
    # metadata probe on the literal glob string; pathGlobFilter on the
    # parent dir is the clean spelling and also skips .tmp leftovers
    base, leaf = os.path.split(path_glob)
    if any(c in leaf for c in "*?["):
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", leaf)
            .load(base)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_bytes(bytes(content)):
                    rows.append(
                        (
                            path,
                            r["warc_type"],
                            r["record_id"],
                            r["target_uri"],
                            r["warc_date"],
                            r["content_length"],
                            len(r["payload"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "warc_type", "record_id", "target_uri",
                    "warc_date", "content_length", "payload_bytes",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse,
        schema=(
            "file string, warc_type string, record_id string, "
            "target_uri string, warc_date string, content_length long, "
            "payload_bytes long"
        ),
    )


# ---------------------------------------------------------------------
# warc.gz — the layout Common Crawl actually ships: each WARC record
# is its OWN gzip member and the members are concatenated, so a
# consumer can seek to any record boundary and decompress one record
# without touching the rest of the file (the cdx-index access
# pattern).  The member split below is exact — a zlib decompressobj
# consumes one member to EOF and hands back ``unused_data`` as the
# next member's start — never a heuristic scan for 0x1F8B magics
# (which legitimately occur INSIDE deflate streams).
# ---------------------------------------------------------------------


def write_warc_gz_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    uri_cols: tuple[str, ...] = ("source",),
    shard_col: str = "shard_id",
) -> DataFrame:
    """Like :func:`write_warc_shards` but per-record-gzip'd
    (``shard-{id:06d}.warc.gz``); members use mtime 0 so shard bytes
    stay content-deterministic.  Manifest adds ``gz_bytes``."""
    import pandas as pd

    schema = (
        f"{shard_col} int, n_records long, payload_bytes long, "
        "gz_bytes long"
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import gzip
        import os

        pdf = pdf.sort_values(key_col)
        shard_id = int(pdf[shard_col].iloc[0])

        def gz(record: bytes) -> bytes:
            return gzip.compress(record, compresslevel=6, mtime=0)

        blob = bytearray(
            gz(
                _record(
                    [
                        ("WARC-Type", "warcinfo"),
                        ("WARC-Date", _DATE),
                        (
                            "WARC-Record-ID",
                            f"<urn:uuid:{_fake_uuid(f'info-{shard_id}')}>",
                        ),
                        ("Content-Type", "application/warc-fields"),
                    ],
                    f"software: engine-warc-writer/1.0{_CRLF}".encode(),
                )
            )
        )
        payload_total = 0
        for _, row in pdf.iterrows():
            key = int(row[key_col])
            path = "/".join(str(row[c]) for c in uri_cols)
            payload = str(row[text_col]).encode("utf-8")
            payload_total += len(payload)
            blob += gz(
                _record(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Date", _DATE),
                        (
                            "WARC-Record-ID",
                            f"<urn:uuid:{_fake_uuid(f'rec-{key}')}>",
                        ),
                        (
                            "WARC-Target-URI",
                            f"https://corpus.example/{path}/{key}",
                        ),
                        ("Content-Type", "text/plain"),
                    ],
                    payload,
                )
            )
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".shard-{shard_id:06d}.tmp")
        final = os.path.join(out_dir, f"shard-{shard_id:06d}.warc.gz")
        with open(tmp, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, final)
        return pd.DataFrame(
            [[shard_id, len(pdf), payload_total, len(blob)]],
            columns=[shard_col, "n_records", "payload_bytes", "gz_bytes"],
        )

    return df.groupBy(shard_col).applyInPandas(write_shard, schema)


def split_gzip_members(data: bytes) -> list[bytes]:
    """Concatenated gzip members → list of decompressed payloads.
    Exact member framing via ``zlib.decompressobj(wbits=31)`` +
    ``unused_data`` — every member must decompress cleanly to EOF
    (truncated trailing members raise)."""
    import zlib

    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        payload = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(payload + d.flush())
        rest = d.unused_data
    return out


def read_warc_gz(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed warc.gz scan: binaryFile per shard → exact gzip
    member split → record parse per member; same row shape as
    :func:`read_warc` plus ``member`` (the record's member ordinal,
    i.e. its random-access index in the shard)."""
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

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for mi, member in enumerate(
                    split_gzip_members(bytes(content))
                ):
                    for r in parse_warc_bytes(member):
                        rows.append(
                            (
                                path,
                                mi,
                                r["warc_type"],
                                r["record_id"],
                                r["target_uri"],
                                r["warc_date"],
                                r["content_length"],
                                len(r["payload"]),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "member", "warc_type", "record_id",
                    "target_uri", "warc_date", "content_length",
                    "payload_bytes",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse,
        schema=(
            "file string, member int, warc_type string, "
            "record_id string, target_uri string, warc_date string, "
            "content_length long, payload_bytes long"
        ),
    )


# ---------------------------------------------------------------------
# HTTP response payloads — in real Common Crawl WARCs the response
# record's payload IS an HTTP/1.1 message (status line + headers +
# body), not bare text.  The parse below implements the RFC 9112
# framing a corpus extractor needs: status line, header fields up to
# the empty line, body = the rest (Content-Length cross-checked when
# present).  Transfer-Encoding: chunked raises — an honest gate; CC
# WARCs are stored de-chunked.
# ---------------------------------------------------------------------


def build_http_response(
    status: int,
    headers: list[tuple[str, str]],
    body: bytes,
    reason: str = "OK",
) -> bytes:
    """Spec-valid HTTP/1.1 response bytes (fixture builder); a
    correct Content-Length is always appended."""
    head = f"HTTP/1.1 {status} {reason}{_CRLF}"
    head += "".join(f"{k}: {v}{_CRLF}" for k, v in headers)
    head += f"Content-Length: {len(body)}{_CRLF}{_CRLF}"
    return head.encode("utf-8") + body


def parse_http_response(payload: bytes) -> dict:
    """HTTP/1.1 response → {status, reason, headers (lower-cased
    keys), body}.  Content-Length, when present, must match the body
    length (a framing error in stored crawl data is data loss, not a
    tolerable quirk); chunked transfer-encoding raises by name."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response has no header terminator")
    head = payload[:sep].decode("iso-8859-1")
    body = payload[sep + 4 :]
    lines = head.split(_CRLF)
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line: {lines[0]!r}")
    status = int(parts[1])
    reason = parts[2] if len(parts) > 2 else ""
    headers: dict[str, str] = {}
    last_key: str | None = None
    for ln in lines[1:]:
        if ln[:1] in (" ", "\t"):
            # obs-fold continuation (RFC 9112 §5.2): the line extends
            # the PREVIOUS field value — treating it as a new header
            # would mint a garbage name from the folded text
            if last_key is None:
                raise ValueError(f"continuation line before any header: {ln!r}")
            headers[last_key] += " " + ln.strip()
            continue
        k, _, v = ln.partition(":")
        key = k.strip().lower()
        if key in headers:
            # repeated fields (Set-Cookie, Via, Warning — legal per
            # RFC 9110 §5.2) combine as a comma-joined list instead of
            # silently keeping only the last value
            headers[key] += ", " + v.strip()
        else:
            headers[key] = v.strip()
        last_key = key
    if headers.get("transfer-encoding", "").lower() == "chunked":
        raise NotImplementedError(
            "chunked transfer-encoding is not supported (Common Crawl "
            "WARCs store de-chunked payloads); de-chunk upstream"
        )
    if "content-length" in headers:
        if int(headers["content-length"]) != len(body):
            raise ValueError(
                "Content-Length does not match stored body length"
            )
    return {
        "status": status,
        "reason": reason,
        "headers": headers,
        "body": body,
    }


def read_warc_http(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC scan that OPENS the HTTP layer of response
    records: (file, target_uri, status, content_type, header_count,
    body_bytes).  Non-response records (warcinfo, …) are skipped
    structurally.  Same scale shape as read_warc — file-level
    parallelism, zero shuffle."""
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

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_bytes(bytes(content)):
                    if r["warc_type"] != "response":
                        continue
                    h = parse_http_response(r["payload"])
                    rows.append(
                        (
                            os.path.basename(path),
                            r["target_uri"],
                            h["status"],
                            h["headers"].get("content-type", ""),
                            len(h["headers"]),
                            len(h["body"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "target_uri", "status", "content_type",
                    "header_count", "body_bytes",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse,
        schema=(
            "file string, target_uri string, status int, "
            "content_type string, header_count int, body_bytes long"
        ),
    )
