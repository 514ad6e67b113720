"""Vendored pure-stdlib TFRecord reader + writer — THE shard format
training loaders stream (TensorFlow's record container; the public
spec is four fields per record):

    length        : uint64 little-endian
    masked_crc32  : uint32 LE — CRC32C of the 8 length bytes, masked
    data          : length bytes
    masked_crc32  : uint32 LE — CRC32C of the data, masked

CRC32C is the Castagnoli polynomial (reflected 0x82F63B78), and the
TF mask is ``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)`` —
both implemented from the public spec so corruption detection is REAL:
the reader recomputes and compares each record's two checksums.
"""

from __future__ import annotations

import struct

_CRC_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def encode_tfrecords(payloads: list[bytes]) -> bytes:
    out = []
    for p in payloads:
        ln = struct.pack("<Q", len(p))
        out.append(ln)
        out.append(struct.pack("<I", masked_crc32c(ln)))
        out.append(p)
        out.append(struct.pack("<I", masked_crc32c(p)))
    return b"".join(out)


def parse_tfrecords(blob: bytes) -> list[dict]:
    """Walk records, recomputing both masked CRCs.  Returns
    [{idx, length, len_crc_ok, data_crc_ok, payload}]; truncation
    raises ``ValueError``."""
    pos, out, idx = 0, [], 0
    while pos < len(blob):
        if pos + 12 > len(blob):
            raise ValueError("truncated TFRecord header")
        ln_bytes = blob[pos : pos + 8]
        (length,) = struct.unpack("<Q", ln_bytes)
        (len_crc,) = struct.unpack("<I", blob[pos + 8 : pos + 12])
        if pos + 12 + length + 4 > len(blob):
            raise ValueError("truncated TFRecord payload")
        payload = blob[pos + 12 : pos + 12 + length]
        (data_crc,) = struct.unpack(
            "<I", blob[pos + 12 + length : pos + 16 + length]
        )
        out.append(
            {
                "idx": idx,
                "length": length,
                "len_crc_ok": len_crc == masked_crc32c(ln_bytes),
                "data_crc_ok": data_crc == masked_crc32c(payload),
                "payload": payload,
            }
        )
        idx += 1
        pos += 16 + length
    return out
