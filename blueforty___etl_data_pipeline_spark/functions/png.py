"""Vendored pure-stdlib PNG codec (grayscale, 8-bit) for the multimodal
decode path.

The container this engine is developed in has no image libraries, so the
"real decode" step of the multimodal pipeline would otherwise stay an
unproven PIL-gated stub forever.  PNG's format is an open public spec
(RFC 2083) and its compression is plain zlib, so a minimal grayscale
codec needs nothing beyond the standard library — this module implements
exactly the subset the pipeline needs:

- :func:`encode_png_gray` — 8-bit grayscale, filter type 0, one IDAT.
  Used to build deterministic in-repo fixtures.
- :func:`decode_png_gray` — full filter support (None/Sub/Up/Average/
  Paeth, so PNGs from *other* encoders decode too), CRC-checked,
  non-interlaced 8-bit grayscale only.  Anything else raises
  ``ValueError`` — the caller treats that as "needs PIL".

This is a decode path, not a performance path: it runs inside the
Arrow-batched ``mapInPandas`` stage where the per-blob Python cost is
already accepted (media decode is inherently per-blob CPU work; the
scale story is partition sizing, not vectorizing the codec).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: list[list[int]]) -> bytes:
    """Encode a row-major grid of 0-255 ints as an 8-bit grayscale PNG
    (filter 0 on every scanline, single IDAT)."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    if any(len(row) != width for row in pixels):
        raise ValueError("ragged pixel grid")
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(data: bytes) -> list[list[int]]:
    """Decode an 8-bit grayscale non-interlaced PNG to a row-major grid
    of 0-255 ints.  Supports all five scanline filters; raises
    ``ValueError`` on anything outside that subset (color, palette,
    16-bit, interlaced, truncated, bad CRC)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = None
    idat = b""
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit grayscale, "
                    f"got depth={depth} color={color} "
                    f"interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
    if width is None or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("decompressed size mismatch")
    rows: list[list[int]] = []
    prev = [0] * width
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, scan = line[0], list(line[1:])
        cur = [0] * width
        for x in range(width):
            left = cur[x - 1] if x else 0
            up = prev[x]
            upleft = prev[x - 1] if x else 0
            v = scan[x]
            if ftype == 0:
                rec = v
            elif ftype == 1:
                rec = v + left
            elif ftype == 2:
                rec = v + up
            elif ftype == 3:
                rec = v + (left + up) // 2
            elif ftype == 4:
                rec = v + _paeth(left, up, upleft)
            else:
                raise ValueError(f"bad filter type {ftype}")
            cur[x] = rec & 0xFF
        rows.append(cur)
        prev = cur
    return rows


def png_gray_features(data: bytes, size: int = 8) -> list[float]:
    """Decode a grayscale PNG and box-average its pixels into ``size``
    horizontal buckets (columns [floor(i*w/size), floor((i+1)*w/size))
    over all rows), normalized to [0, 1].  Deterministic pure-integer
    bucketing — the vendored stand-in for decode→grayscale→resize."""
    rows = decode_png_gray(data)
    width = len(rows[0])
    if width < size:
        raise ValueError(f"image width {width} < feature size {size}")
    feats = []
    for i in range(size):
        lo = i * width // size
        hi = (i + 1) * width // size
        total = sum(sum(row[lo:hi]) for row in rows)
        feats.append(total / ((hi - lo) * len(rows)) / 255.0)
    return feats
