"""Vendored pure-stdlib AVI (RIFF) container codec for MJPEG video —
the VIDEO leg of the multimodal triad (PNG/JPEG images, WAV/FLAC
audio, and now a real video container with a real codec inside).

Motion-JPEG-in-AVI is the simplest genuinely-deployed video format: a
RIFF container whose ``movi`` list holds one baseline-JPEG blob per
frame.  The container walk is ~100 lines of open-spec (Microsoft RIFF
/ OpenDML) parsing, and every frame decodes through the vendored
T.81 codec in :mod:`functions.jpeg` — so "sample frames from a video"
executes end-to-end in this container with no external libraries.

- :func:`encode_avi_mjpeg` — minimal valid AVI: ``avih`` main header,
  one ``vids``/``MJPG`` stream (``strh`` + ``strf`` BITMAPINFOHEADER),
  ``movi`` list of ``00dc`` chunks (even-padded), ``idx1`` index.
- :func:`decode_avi_mjpeg_frames` — chunk walk tolerant of unknown
  LISTs/chunks; returns the raw per-frame JPEG blobs from ``00dc`` /
  ``00db`` entries.  Non-RIFF/AVI input raises ``ValueError``.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(
    jpeg_frames, width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap per-frame JPEG blobs into a minimal valid MJPEG AVI."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    n = len(jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0,                 # max bytes per sec (informational)
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n,                 # total frames
        0,                 # initial frames
        1,                 # streams
        0,                 # suggested buffer size
        width,
        height,
        0, 0, 0, 0,        # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,      # flags
            0, 0,   # priority, language
            0,      # initial frames
            1,      # scale
            fps,    # rate (rate/scale = fps)
            0,      # start
            n,      # length in frames
            0,      # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,      # sample size (varies per frame)
            0,      # rcFrame (packed 4x int16 == 8 bytes -> two I's)
        )
        + struct.pack("<I", 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_entries = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_entries)
    # idx1: one entry per frame (offset relative to the movi fourcc)
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", b"AVI " + body)


def decode_avi_mjpeg_frames(data: bytes):
    """Walk the RIFF tree and return the list of per-frame JPEG blobs
    (``00dc``/``00db`` chunks of the ``movi`` list, in order)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            payload_start = pos + 8
            payload_end = payload_start + size
            if payload_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(buf, payload_start + 4, payload_end)
            elif fourcc in (b"00dc", b"00db") and size > 0:
                frames.append(buf[payload_start:payload_end])
            pos = payload_end + (size & 1)

    walk(data, 12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


def avi_frame_stats(data: bytes, every_k: int = 1):
    """Decode an MJPEG AVI and return per-SAMPLED-frame integer stats
    (frame_no, width, height, mean_floor, px_min, px_max) — the same
    row shape as :func:`functions.gif.gif_frame_stats`, with each
    frame decoded through the vendored baseline/progressive JPEG
    codec.  All-integer, engine-exact, oracle-checkable."""
    from .jpeg import decode_jpeg_gray_any

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    blobs = decode_avi_mjpeg_frames(data)
    out = []
    for i in range(0, len(blobs), every_k):
        rows = decode_jpeg_gray_any(blobs[i])
        h = len(rows)
        w = len(rows[0])
        total = sum(sum(r) for r in rows)
        out.append(
            (
                i,
                w,
                h,
                total // (w * h),
                min(min(r) for r in rows),
                max(max(r) for r in rows),
            )
        )
    return out
