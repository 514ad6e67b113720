"""Pure-stdlib Apache Avro Object Container File source/sink.

Avro is the interchange format of the Kafka/Hadoop world; Spark's own
``spark-avro`` module is an external jar this container does not ship,
so — same policy as the PNG/JPEG/FLAC codecs — the open specification
(avro.apache.org, container-file format) is implemented directly:

- zigzag + varint ``long`` encoding, length-prefixed UTF-8 strings,
  union index prefixes for nullable fields;
- container layout: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  blocks of (record count, byte size, records, sync) — the sync
  marker after EVERY block is verified on read (corruption detection
  per spec).

Schema subset — exactly the flat shape pipeline feeds use: a record
of ``long``, ``string``, and nullable ``["null","<t>"]`` fields.
Nested records, enums, and deflate blocks raise ``ValueError``.

Scale shape: like WARC/XLSX — file-level parallelism (one container
per task via ``binaryFile``).  Real Avro feeds are many medium files
(Kafka topic dumps), so this is the natural unit; block-level splits
would need the sync-marker scan that splittable HadoopInputFormats
do, which buys nothing at this file size profile.
"""

from __future__ import annotations

import io
import json
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return zigzag_encode(len(raw)) + raw


def _dec_str(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = zigzag_decode(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _field_kinds(schema: dict) -> list[tuple[str, str, bool]]:
    """[(name, base_type, nullable)] from a flat record schema."""
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null":
                raise ValueError(f"unsupported union {t}")
            t, nullable = t[1], True
        if t not in ("long", "string"):
            raise ValueError(f"unsupported field type {t!r}")
        out.append((f["name"], t, nullable))
    return out


def write_avro(
    records: list[dict],
    schema: dict,
    path: str,
    block_records: int = 100,
) -> int:
    """Write an Avro Object Container File; returns block count.

    Deterministic: the sync marker derives from the schema + record
    count, so identical input produces identical bytes (idempotent
    re-runs, content-addressable shards).
    """
    kinds = _field_kinds(schema)
    sync = hashlib.md5(
        (json.dumps(schema, sort_keys=True) + str(len(records))).encode()
    ).digest()
    header = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True),
        "avro.codec": "null",
    }
    header += zigzag_encode(len(meta))
    for k in sorted(meta):
        header += _enc_str(k) + _enc_str(meta[k])
    header += zigzag_encode(0)  # end of metadata map
    header += sync

    body = bytearray()
    n_blocks = 0
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        blk = bytearray()
        for rec in chunk:
            for name, t, nullable in kinds:
                v = rec.get(name)
                if nullable:
                    if v is None:
                        blk += zigzag_encode(0)
                        continue
                    blk += zigzag_encode(1)
                elif v is None:
                    raise ValueError(f"null in non-nullable field {name}")
                if t == "long":
                    blk += zigzag_encode(int(v))
                else:
                    blk += _enc_str(str(v))
        body += zigzag_encode(len(chunk))
        body += zigzag_encode(len(blk))
        body += blk + sync
        n_blocks += 1
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(header + body))
    os.replace(tmp, path)
    return n_blocks


def parse_avro(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a container file → (schema, records)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = zigzag_decode(data, pos)
        for _ in range(n):
            k, pos = _dec_str(data, pos)
            vlen, pos = zigzag_decode(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
    schema = json.loads(meta["avro.schema"])
    codec = bytes(meta.get("avro.codec", b"null"))
    if codec != b"null":
        raise ValueError(f"unsupported codec {codec!r}")
    kinds = _field_kinds(schema)
    sync = data[pos : pos + 16]
    pos += 16
    records = []
    while pos < len(data):
        cnt, pos = zigzag_decode(data, pos)
        size, pos = zigzag_decode(data, pos)
        end = pos + size
        for _ in range(cnt):
            rec = {}
            for name, t, nullable in kinds:
                if nullable:
                    idx, pos = zigzag_decode(data, pos)
                    if idx == 0:
                        rec[name] = None
                        continue
                if t == "long":
                    rec[name], pos = zigzag_decode(data, pos)
                else:
                    rec[name], pos = _dec_str(data, pos)
            records.append(rec)
        if pos != end:
            raise ValueError("block size mismatch")
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return schema, records


def read_avro(
    spark: SparkSession, path_glob: str, schema: dict | None = None
) -> DataFrame:
    """Distributed Avro scan: one container per task; output columns
    are the schema's fields (long → bigint, string → string).

    ``schema`` (an Avro record schema dict) is optional: when given it
    is used directly — no driver-side peek, and an EMPTY match (a
    legitimately empty shard set after partition pruning) yields an
    empty frame with the right columns.  Without it the schema is
    peeked from the first container (Avro is self-describing), and a
    zero-file match raises, since there is nothing to describe the
    output columns."""
    base, leaf = os.path.split(path_glob)
    reader = spark.read.format("binaryFile")
    if any(ch in leaf for ch in "*?["):
        files = reader.option("pathGlobFilter", leaf).load(base)
    else:
        files = reader.load(path_glob)

    if schema is None:
        # peek one file on the driver for the output schema
        # (metadata-only, same trick as spark.read.json schema
        # inference but O(1 file))
        first = files.select("content").limit(1).collect()
        if not first:
            raise ValueError(f"no avro files under {path_glob}")
        schema, _ = parse_avro(bytes(first[0][0]))
    kinds = _field_kinds(schema)
    out_schema = ", ".join(
        f"{n} {'bigint' if t == 'long' else 'string'}"
        for n, t, _ in kinds
    )

    def parse(batches):
        import pandas as pd

        names = [n for n, _, _ in kinds]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _, recs = parse_avro(bytes(content))
                rows.extend(tuple(r[n] for n in names) for r in recs)
            yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(parse, schema=out_schema)


def schema_compat(reader: dict, writer: dict) -> tuple[bool, list[str]]:
    """Avro schema-resolution check (the spec's "Schema Resolution"
    rules, restricted to this module's flat subset): can data written
    with ``writer`` be read under ``reader``?

    Rules applied:
    - a reader field missing from the writer is OK iff it has a
      ``default`` (the reader fills it in);
    - a writer field missing from the reader is OK (ignored);
    - matching fields resolve iff base types are equal, or the writer
      type is a member of the reader's nullable union (``long`` →
      ``["null","long"]`` widens); the reverse (union → plain) does
      NOT resolve — the null branch has nowhere to go.

    Returns (compatible, reasons) with one reason string per
    violation — the report a schema-registry gate logs.  This is the
    check that belongs in the INGEST path: feeds evolve, and a
    registry-less pipeline that skips it discovers incompatibility as
    a mid-job decode error instead of a pre-flight verdict.
    """
    r_fields = {f["name"]: f for f in reader["fields"]}
    w_fields = {f["name"]: f for f in writer["fields"]}
    reasons = []

    def norm(t):
        return t if isinstance(t, list) else [t]

    for name, rf in r_fields.items():
        if name not in w_fields:
            if "default" not in rf:
                reasons.append(
                    f"reader field '{name}' missing from writer and "
                    "has no default"
                )
            continue
        rt, wt = norm(rf["type"]), norm(w_fields[name]["type"])
        # every writer branch must be readable under some reader branch
        for branch in wt:
            if branch not in rt:
                reasons.append(
                    f"field '{name}': writer type {branch!r} not "
                    f"accepted by reader type {rf['type']!r}"
                )
    return not reasons, reasons
