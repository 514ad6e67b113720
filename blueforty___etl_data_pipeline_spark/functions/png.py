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


# --- general (color / palette / interlaced) support --------------------------
#
# Real-world PNGs span five color types, bit depths 1-16, and Adam7
# interlacing.  decode_png_gray_any handles all of them and returns a
# grayscale grid (color mapped by the integer luminance
# (2·r + 5·g + b) // 8 — the GIF codec's exact-integer convention);
# encode_png_rgb emits truecolor fixtures so the color path is
# round-trip-proven in-container.

#: Adam7 pass layout: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png_rgb(pixels_rgb) -> bytes:
    """Encode a row-major grid of (r, g, b) tuples as an 8-bit
    truecolor PNG (color type 2, filter 0, single IDAT)."""
    if not pixels_rgb or not pixels_rgb[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels_rgb)
    width = len(pixels_rgb[0])
    if any(len(row) != width for row in pixels_rgb):
        raise ValueError("ragged pixel grid")
    raw = b"".join(
        b"\x00" + bytes(c for px in row for c in px)
        for row in pixels_rgb
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, bpp: int,
              stride: int):
    """Reverse PNG scanline filtering; returns rows of raw bytes."""
    rows = []
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        scan = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:
            for x in range(bpp, stride):
                scan[x] = (scan[x] + scan[x - bpp]) & 0xFF
        elif ftype == 2:
            for x in range(stride):
                scan[x] = (scan[x] + prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(stride):
                left = scan[x - bpp] if x >= bpp else 0
                scan[x] = (scan[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:
            for x in range(stride):
                left = scan[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                scan[x] = (scan[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        rows.append(bytes(scan))
        prev = scan
    return rows


def _samples(row: bytes, width: int, channels: int, depth: int):
    """Per-pixel channel tuples from one unfiltered scanline."""
    out = []
    if depth == 8:
        for x in range(width):
            out.append(tuple(row[x * channels : (x + 1) * channels]))
    elif depth == 16:
        for x in range(width):
            base = x * channels * 2
            out.append(
                tuple(row[base + 2 * c] for c in range(channels))
            )
    else:  # 1/2/4-bit (gray or palette only, per spec)
        per_byte = 8 // depth
        mask = (1 << depth) - 1
        for x in range(width):
            b = row[x // per_byte]
            shift = 8 - depth * (x % per_byte + 1)
            out.append(((b >> shift) & mask,))
    return out


def decode_png_gray_any(data: bytes) -> list[list[int]]:
    """Decode ANY supported PNG to a grayscale grid: color types 0/2/
    3/4/6, bit depths 1/2/4/8/16 (16-bit uses the high byte), Adam7
    interlacing, palette lookup, all five filters, CRC-checked.
    Grayscale sub-8-bit samples scale to 0-255; color maps by integer
    luminance (2·r + 5·g + b) // 8; alpha is ignored."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = None
    depth = color = interlace = 0
    palette = None
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
            if comp or filt or color not in _CHANNELS:
                raise ValueError("unsupported PNG header")
            if interlace not in (0, 1):
                raise ValueError("unsupported interlace method")
        elif typ == b"PLTE":
            palette = [
                (2 * body[3 * i] + 5 * body[3 * i + 1]
                 + body[3 * i + 2]) // 8
                for i in range(len(body) // 3)
            ]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
    if width is None or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    channels = _CHANNELS[color]
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color not in (0, 3)
    ):
        raise ValueError("unsupported bit depth for color type")
    raw = zlib.decompress(idat)
    bpp = max(1, channels * depth // 8)

    def to_gray(px) -> int:
        if color == 3:
            if palette is None or px[0] >= len(palette):
                raise ValueError("palette index out of range")
            return palette[px[0]]
        if color in (0, 4):
            v = px[0]
            if depth < 8:
                v = v * 255 // ((1 << depth) - 1)
            return v
        r, g, b = px[0], px[1], px[2]
        return (2 * r + 5 * g + b) // 8

    out = [[0] * width for _ in range(height)]
    if interlace == 0:
        stride = (width * channels * depth + 7) // 8
        rows = _unfilter(raw, width, height, bpp, stride)
        if len(raw) != (stride + 1) * height:
            raise ValueError("decompressed size mismatch")
        for y, row in enumerate(rows):
            for x, px in enumerate(_samples(row, width, channels, depth)):
                out[y][x] = to_gray(px)
        return out
    # Adam7: seven sub-images, each filtered independently
    pos = 0
    for (x0, y0, dx, dy) in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp == 0 or hp == 0:
            continue
        stride = (wp * channels * depth + 7) // 8
        seg = raw[pos : pos + (stride + 1) * hp]
        if len(seg) != (stride + 1) * hp:
            raise ValueError("truncated interlace pass")
        pos += len(seg)
        rows = _unfilter(seg, wp, hp, bpp, stride)
        for ry, row in enumerate(rows):
            for rx, px in enumerate(_samples(row, wp, channels, depth)):
                out[y0 + ry * dy][x0 + rx * dx] = to_gray(px)
    return out


def png_gray_features_any(data: bytes, size: int = 8) -> list[float]:
    """Pooled features over ANY supported PNG variant — identical
    pooling to :func:`png_gray_features`."""
    rows = decode_png_gray_any(data)
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
