"""Pure-stdlib Ogg container codec (RFC 3533) with Opus
(RFC 7845) and Vorbis identification-header parsing — the remaining
audio container a crawl corpus yields after WAV/FLAC (decoded) and
MP3/M4A (metadata-triaged).

An Ogg stream is a sequence of PAGES: ``OggS`` capture pattern,
version 0, header-type flags (BOS/EOS/continued), a 64-bit granule
position (for audio: the PCM sample count at page end), stream
serial, page sequence number, a CRC-32 over the whole page (poly
0x04C11DB7, unreflected, zero init/xor — NOT zlib's crc32), and a
lacing-value segment table that splits the payload into packets
(255 ⇒ packet continues).  All of that is implemented for real here,
including CRC verification on parse.

Codec layer: the first packet of the first page identifies the
codec — ``OpusHead`` (channels, pre-skip, input sample rate, mapping
family) or ``\\x01vorbis`` (channels, rate, bitrate triple).  Audio
SYNTHESIS for both is a documented boundary (CELT/MDCT window and
range-coder probability tables are spec TABLES, not formulas — the
same rationale as :mod:`functions.mp3`); duration, however, is exact
from the last page's granule position, which is precisely what a
corpus triage needs.

Reference parity: the reference pipeline (BlueForty.py) has no media
path; this extends the engine's multimodal ingest surface.
"""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: unreflected CRC-32/0x04C11DB7, init 0."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def _page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    header_type: int = 0,
) -> bytes:
    segments = []
    for p in packets:
        n, rem = divmod(len(p), 255)
        segments.extend([255] * n)
        segments.append(rem)  # a multiple-of-255 packet ends with a 0
    if len(segments) > 255:
        raise ValueError("too many lacing segments for one page")
    header = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes([len(segments)])
        + bytes(segments)
    )
    body = b"".join(packets)
    crc = ogg_crc(header + body)
    return header[:22] + struct.pack("<I", crc) + header[26:] + body


def encode_ogg_opus(
    n_frames: int,
    samplerate: int = 48000,
    channels: int = 2,
    pre_skip: int = 312,
    frame_samples: int = 960,
    serial: int = 1,
) -> bytes:
    """Build a spec-valid Ogg Opus stream: BOS page carrying a real
    ``OpusHead``, a comment page (``OpusTags``), then one audio page
    per frame with correct cumulative granule positions and a real
    CRC on every page.  The audio packet PAYLOADS are filler (Opus
    synthesis stays the documented boundary) but every byte the
    metadata path inspects — capture pattern, flags, granules,
    lacing, CRCs, OpusHead fields — is spec-true."""
    if n_frames < 1:
        raise ValueError("need at least one audio frame")
    head = (
        b"OpusHead\x01"
        + bytes([channels])
        + struct.pack("<HIhB", pre_skip, samplerate, 0, 0)
    )
    tags = b"OpusTags" + struct.pack("<I", 6) + b"vendor" + struct.pack("<I", 0)
    pages = [
        _page(serial, 0, 0, [head], header_type=0x02),  # BOS
        _page(serial, 1, 0, [tags]),
    ]
    granule = pre_skip
    for i in range(n_frames):
        granule += frame_samples
        eos = 0x04 if i == n_frames - 1 else 0
        payload = bytes([(i * 7 + j) & 0xFF for j in range(20 + i % 5)])
        pages.append(_page(serial, 2 + i, granule, [payload], eos))
    return b"".join(pages)


def ogg_meta(data: bytes):
    """Walk every page (verifying each CRC), identify the codec from
    the BOS packet, and return
    ``(codec, serial, n_pages, channels, samplerate, pre_skip,
    duration_samples)`` — duration exact from the final granule
    position (minus pre-skip for Opus, per RFC 7845 §4.2)."""
    pos = 0
    n_pages = 0
    serial = None
    last_granule = 0
    first_packet = b""
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg page sync")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        granule, ser, _seq, crc = struct.unpack(
            "<qIIi", data[pos + 6 : pos + 26]
        )
        n_seg = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + n_seg]
        body_len = sum(seg_table)
        page_end = pos + 27 + n_seg + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc & 0xFFFFFFFF:
            raise ValueError(f"Ogg page {n_pages} CRC mismatch")
        if serial is None:
            serial = ser
            first_packet = data[pos + 27 + n_seg : page_end]
        if ser == serial and granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = page_end

    if n_pages == 0:
        raise ValueError("no Ogg pages")
    if first_packet.startswith(b"OpusHead"):
        channels = first_packet[9]
        pre_skip, rate = struct.unpack("<HI", first_packet[10:16])
        return (
            "opus", serial, n_pages, channels, rate, pre_skip,
            max(0, last_granule - pre_skip),
        )
    if first_packet.startswith(b"\x01vorbis"):
        channels = first_packet[11]
        (rate,) = struct.unpack("<I", first_packet[12:16])
        return ("vorbis", serial, n_pages, channels, rate, 0, last_granule)
    raise NotImplementedError(
        "Ogg stream is neither Opus nor Vorbis (unknown BOS packet); "
        "only metadata for those codecs is supported"
    )
