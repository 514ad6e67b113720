"""Deterministic identifier construction — ULID (ulid.github.io
spec): 128 bits rendered as 26 Crockford-base32 chars, 48-bit
millisecond timestamp first so ids SORT BY CREATION TIME
lexicographically.  Time-ordered ids are the ingestion primitive that
keeps id-clustered storage append-friendly (UUIDv4 scatters every
write); here the 80 "random" bits derive from the portable md5 hash
of the record key, so assignment is reproducible on any engine and
stable under repartition/retry — the same no-RNG discipline as
``hash_split``.

All pure Column expressions (bit shifts + a literal alphabet lookup);
no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Crockford base32 — no I, L, O, U.
CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _b32(code: Column) -> Column:
    return F.substring(
        F.lit(CROCKFORD), (code + 1).cast("int"), F.lit(1)
    )


def ulid_from_parts(ts_ms: Column, key: Column) -> Column:
    """ULID string from a millisecond timestamp and a record key: the
    10 time chars encode ``ts_ms & (2^48−1)`` big-endian, the 16
    entropy chars encode 80 bits of ``md5(key)`` (two 40-bit halves,
    so every intermediate stays inside a signed 64-bit lane)."""
    t48 = ts_ms.cast("bigint").bitwiseAND(F.lit((1 << 48) - 1))
    h = F.md5(key.cast("string"))
    r_hi = F.conv(F.substring(h, 1, 10), 16, 10).cast("bigint")
    r_lo = F.conv(F.substring(h, 11, 10), 16, 10).cast("bigint")
    chars = []
    for i in range(10):
        chars.append(_b32(F.shiftrightunsigned(t48, 45 - 5 * i) % 32))
    for j in range(8):
        chars.append(_b32(F.shiftrightunsigned(r_hi, 35 - 5 * j) % 32))
    for j in range(8):
        chars.append(_b32(F.shiftrightunsigned(r_lo, 35 - 5 * j) % 32))
    return F.concat(*chars)
