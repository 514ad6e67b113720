"""Pure-stdlib Windows BMP (DIB) codec — 24-bit uncompressed — for the
image ingest path.

BMP is the simplest widely-seen raster container (BITMAPFILEHEADER +
BITMAPINFOHEADER + raw BGR rows, 4-byte row stride padding, bottom-up
by default, top-down when the header height is negative).  It is
lossless and fully public (Windows GDI documentation), so — like PNG
(:mod:`functions.png`) and TIFF (:mod:`functions.rasters`) — it can
carry an engine-exact oracle fixture, and real-world scrape corpora
still contain plenty of them.

Subset implemented: 24 bits per pixel, ``BI_RGB`` (uncompressed),
both row orders.  Palette, RLE, 16/32-bpp, and V4/V5 headers raise
``ValueError`` — honest gates in the house style.
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def _stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_bmp24(
    pixels: list[list[tuple[int, int, int]]], topdown: bool = False
) -> bytes:
    """Encode rows of (r, g, b) tuples (row 0 = TOP of the image).

    ``topdown=False`` writes the classic bottom-up layout (positive
    header height, last row first); ``topdown=True`` writes top-down
    (negative height), so both orientations exist in fixtures and the
    decoder's flip logic is really exercised.
    """
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    stride = _stride(w)
    body = bytearray()
    rows = pixels if topdown else list(reversed(pixels))
    for row in rows:
        if len(row) != w:
            raise ValueError("ragged pixel rows")
        for r, g, b in row:
            body += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        body += bytes(stride - 3 * w)
    info = _INFO_HDR.pack(
        40, w, -h if topdown else h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    file_hdr = _FILE_HDR.pack(
        BMP_MAGIC, 14 + 40 + len(body), 0, 0, 14 + 40
    )
    return file_hdr + info + bytes(body)


def decode_bmp24(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Decode to rows of (r, g, b), row 0 = TOP regardless of the
    stored row order."""
    if len(data) < 54 or data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    _, file_size, _, _, offset = _FILE_HDR.unpack_from(data, 0)
    (
        hdr_size, w, h_signed, planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = _INFO_HDR.unpack_from(data, 14)
    if hdr_size != 40:
        raise ValueError(f"only BITMAPINFOHEADER supported (got {hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bpp BI_RGB supported")
    if planes != 1 or w <= 0 or h_signed == 0:
        raise ValueError("malformed BMP dimensions")
    topdown = h_signed < 0
    h = -h_signed if topdown else h_signed
    stride = _stride(w)
    if offset + h * stride > len(data):
        raise ValueError("pixel array overruns stream")
    rows = []
    for y in range(h):
        src = offset + y * stride
        row = [
            (data[src + 3 * x + 2], data[src + 3 * x + 1], data[src + 3 * x])
            for x in range(w)
        ]
        rows.append(row)
    return rows if topdown else rows[::-1]


def bmp_stats(data: bytes) -> dict:
    """Decode and fold to oracle-checkable exact-integer stats."""
    rows = decode_bmp24(data)
    h = len(rows)
    w = len(rows[0]) if h else 0
    sum_r = sum(p[0] for row in rows for p in row)
    sum_g = sum(p[1] for row in rows for p in row)
    sum_b = sum(p[2] for row in rows for p in row)
    # top-row-weighted checksum: wrong orientation handling changes it
    wsum_r = sum(y * sum(p[0] for p in row) for y, row in enumerate(rows))
    return {
        "width": w,
        "height": h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "wsum_r": wsum_r,
        "file_bytes": len(data),
    }


def bmp_gray_features(data: bytes, size: int = 8) -> list[float]:
    """Grayscale pooled features in [0, 1] — the BMP arm of the image
    decode dispatch (operators/multimodal.decode_image_real)."""
    rows = decode_bmp24(data)
    h = len(rows)
    w = len(rows[0]) if h else 0
    gray = [
        [(r + g + b) // 3 for (r, g, b) in row] for row in rows
    ]
    feats = []
    for c in range(size):
        x0, x1 = c * w // size, max((c + 1) * w // size, c * w // size + 1)
        x1 = min(x1, w)
        vals = [gray[y][x] for y in range(h) for x in range(x0, x1)]
        feats.append(sum(vals) / (255.0 * len(vals)) if vals else 0.0)
    return feats
