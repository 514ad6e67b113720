"""Pure-stdlib simple-raster codecs (BMP, Netpbm PGM/PPM) for the
multimodal decode path — the uncompressed formats scraped corpora
actually contain alongside PNG/JPEG/GIF.

- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (BI_RGB only), 8-bit
  paletted or 24-bit BGR, bottom-up or top-down rows, 4-byte row
  padding.  Encoder emits 8-bit grayscale-palette fixtures.
- Netpbm: P2/P5 (gray ASCII/binary) and P3/P6 (RGB), maxval ≤ 255,
  comment lines handled.  Encoder emits P5.
- TIFF: uncompressed 8-bit gray (BlackIsZero/WhiteIsZero) or RGB,
  II/MM byte orders, classic IFD walk, multi-strip payloads.

Color maps to gray with the exact-integer luminance convention
(2·r + 5·g + b) // 8 shared by the GIF/PNG codecs, so frame stats
are engine-exact and oracle-checkable.
"""

from __future__ import annotations

import struct


def _lum(r: int, g: int, b: int) -> int:
    return (2 * r + 5 * g + b) // 8


# --- BMP ---------------------------------------------------------------------


def encode_bmp_gray(pixels) -> bytes:
    """Encode a row-major 0-255 grid as an 8-bit grayscale-palette
    BMP (BI_RGB, bottom-up)."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    if any(len(r) != width for r in pixels):
        raise ValueError("ragged pixel grid")
    pad = (-width) % 4
    rows = b"".join(
        bytes(pixels[y]) + b"\x00" * pad
        for y in range(height - 1, -1, -1)
    )
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(rows),
        2835, 2835, 256, 0,
    )
    offset = 14 + len(dib) + len(palette)
    head = b"BM" + struct.pack(
        "<IHHI", offset + len(rows), 0, 0, offset
    )
    return head + dib + palette + rows


def decode_bmp_gray(data: bytes):
    """Decode an uncompressed (BI_RGB) 8-bit-paletted or 24-bit BMP
    to a row-major gray grid (top-down)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise ValueError("only BI_RGB (uncompressed) BMP supported")
    if bpp not in (8, 24):
        raise ValueError("only 8-bit paletted or 24-bit BMP supported")
    top_down = height < 0
    height = abs(height)
    pal = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pbase = 14 + hdr_size
        pal = [
            _lum(
                data[pbase + 4 * i + 2],
                data[pbase + 4 * i + 1],
                data[pbase + 4 * i],
            )
            for i in range(n_colors)
        ]
    stride = (width * bpp // 8 + 3) & ~3
    out = []
    for row_i in range(height):
        src = row_i if top_down else height - 1 - row_i
        base = offset + src * stride
        if bpp == 8:
            row = []
            for x in range(width):
                v = data[base + x]
                if v >= len(pal):
                    raise ValueError("palette index out of range")
                row.append(pal[v])
        else:
            row = [
                _lum(
                    data[base + 3 * x + 2],
                    data[base + 3 * x + 1],
                    data[base + 3 * x],
                )
                for x in range(width)
            ]
        out.append(row)
    return out


# --- Netpbm ------------------------------------------------------------------


def encode_pgm(pixels) -> bytes:
    """Encode a row-major 0-255 grid as binary PGM (P5)."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    head = f"P5\n{width} {height}\n255\n".encode()
    return head + b"".join(bytes(r) for r in pixels)


def _pnm_tokens(data: bytes, n: int, pos: int):
    """Read n whitespace-separated ASCII integers, skipping
    # comments; returns (values, new_pos)."""
    vals = []
    while len(vals) < n:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    return vals, pos


def decode_pnm_gray(data: bytes):
    """Decode P2/P5 (gray) or P3/P6 (RGB) Netpbm to a gray grid."""
    magic = data[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError("not a supported PNM (need P2/P3/P5/P6)")
    (width, height, maxval), pos = _pnm_tokens(data, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    channels = 3 if magic in (b"P3", b"P6") else 1
    n = width * height * channels
    if magic in (b"P5", b"P6"):
        pos += 1  # single whitespace after maxval
        raw = data[pos : pos + n]
        if len(raw) != n:
            raise ValueError("truncated PNM payload")
        vals = list(raw)
    else:
        vals, _ = _pnm_tokens(data, n, pos)
    scale = 255 // maxval if maxval < 255 else 1

    def px(i: int) -> int:
        if channels == 1:
            return vals[i] * scale
        r, g, b = vals[3 * i], vals[3 * i + 1], vals[3 * i + 2]
        return _lum(r * scale, g * scale, b * scale)

    return [
        [px(y * width + x) for x in range(width)] for y in range(height)
    ]


def raster_gray_stats(data: bytes):
    """Dispatch on magic (BMP / TIFF / PNM) and return the all-integer
    frame-stat row (width, height, mean_floor, px_min, px_max)."""
    if data[:2] == b"BM":
        rows = decode_bmp_gray(data)
    elif data[:2] in (b"II", b"MM"):
        rows = decode_tiff_gray(data)
    else:
        rows = decode_pnm_gray(data)
    h = len(rows)
    w = len(rows[0])
    total = sum(sum(r) for r in rows)
    return (
        w,
        h,
        total // (w * h),
        min(min(r) for r in rows),
        max(max(r) for r in rows),
    )


# --- TIFF (uncompressed) -----------------------------------------------------


def decode_tiff_gray(data: bytes):
    """Decode an UNCOMPRESSED (Compression=1) single-strip-or-multi-
    strip TIFF — 8-bit grayscale (Photometric 1/0) or 8-bit RGB — to
    a gray grid.  Handles both II (little) and MM (big) byte orders
    and the classic IFD walk.  LZW/packbits/JPEG-in-TIFF raise."""
    if data[:2] == b"II":
        bo = "little"
    elif data[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF (bad byte order)")

    def u16(off):
        return int.from_bytes(data[off : off + 2], bo)

    def u32(off):
        return int.from_bytes(data[off : off + 4], bo)

    if u16(2) != 42:
        raise ValueError("not a TIFF (bad magic number)")
    ifd = u32(4)
    n_entries = u16(ifd)
    tags = {}
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        tag, typ, count = u16(e), u16(e + 2), u32(e + 4)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            tags[tag] = None
            continue
        total = size * count
        voff = e + 8 if total <= 4 else u32(e + 8)
        vals = [
            int.from_bytes(data[voff + size * j : voff + size * (j + 1)], bo)
            for j in range(count)
        ]
        tags[tag] = vals
    width = tags.get(256, [0])[0]
    height = tags.get(257, [0])[0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    strip_offsets = tags.get(273)
    strip_counts = tags.get(279)
    rows_per_strip = tags.get(278, [height])[0]
    if compression != 1:
        raise ValueError("only uncompressed TIFF supported")
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError("only 8-bit gray or RGB TIFF supported")
    if photometric not in (0, 1, 2):
        raise ValueError("unsupported photometric interpretation")
    if not width or not height or not strip_offsets:
        raise ValueError("missing required TIFF tags")
    payload = bytearray()
    for off, cnt in zip(
        strip_offsets, strip_counts or [len(data)] * len(strip_offsets)
    ):
        payload += data[off : off + cnt]
    need = width * height * spp
    if len(payload) < need:
        raise ValueError("truncated TIFF strips")
    out = []
    for y in range(height):
        base = y * width * spp
        if spp == 1:
            row = [payload[base + x] for x in range(width)]
            if photometric == 0:  # WhiteIsZero
                row = [255 - v for v in row]
        else:
            row = [
                _lum(
                    payload[base + 3 * x],
                    payload[base + 3 * x + 1],
                    payload[base + 3 * x + 2],
                )
                for x in range(width)
            ]
        out.append(row)
    return out


def encode_tiff_gray(pixels, byte_order: str = "little") -> bytes:
    """Encode a gray grid as a minimal uncompressed single-strip TIFF
    (BlackIsZero), II or MM byte order."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    bo = byte_order
    magic = b"II" if bo == "little" else b"MM"
    payload = b"".join(bytes(r) for r in pixels)

    def p16(v):
        return v.to_bytes(2, bo)

    def p32(v):
        return v.to_bytes(4, bo)

    # header(8) + payload, IFD after payload
    ifd_off = 8 + len(payload)
    entries = [
        (256, 3, 1, width),       # ImageWidth
        (257, 3, 1, height),      # ImageLength
        (258, 3, 1, 8),           # BitsPerSample
        (259, 3, 1, 1),           # Compression: none
        (262, 3, 1, 1),           # Photometric: BlackIsZero
        (273, 4, 1, 8),           # StripOffsets -> right after header
        (277, 3, 1, 1),           # SamplesPerPixel
        (278, 3, 1, height),      # RowsPerStrip
        (279, 4, 1, len(payload)),  # StripByteCounts
    ]
    ifd = p16(len(entries))
    for tag, typ, count, val in entries:
        raw = p16(tag) + p16(typ) + p32(count)
        if typ == 3:
            raw += p16(val) + b"\x00\x00"
        else:
            raw += p32(val)
        ifd += raw
    ifd += p32(0)  # next IFD
    return magic + p16(42) + p32(ifd_off) + payload + ifd
