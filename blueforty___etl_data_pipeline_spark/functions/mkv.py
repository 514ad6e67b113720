"""Vendored pure-stdlib Matroska/WebM (EBML, RFC 8794) container
codec for Motion-JPEG video — the third and last of the big container
families a multimodal crawl actually yields: RIFF/AVI
(:mod:`functions.avi`), ISO BMFF/MP4 (:mod:`functions.mp4`), and
EBML/MKV-WebM (this module).

EBML is a binary XML: every element is ``(variable-length ID,
variable-length size, payload)``, nested.  The varint scheme puts the
byte length in the position of the first set bit — the size strips
that marker bit, element IDs keep it (RFC 8794 §4/§5).  The walk here
implements that for real, including the ``0xFF…`` "unknown size"
form used by live-streamed segments (treated as extends-to-end).

Structure produced/consumed:

- EBML header (DocType ``matroska``),
- ``Segment`` → ``Info`` (TimestampScale, Duration),
- ``Tracks`` → ``TrackEntry`` (number, type, CodecID, Video
  width/height or Audio channels/rate),
- ``Cluster``\\ s → ``Timestamp`` + ``SimpleBlock``\\ s (track varint,
  16-bit relative timestamp, flags, frame payload; no lacing).

Codec policy mirrors the media stack: ``V_MJPEG`` tracks decode
frame-for-frame through the vendored T.81 JPEG codec; compressed
codecs (``V_VP8/V_VP9/V_AV1/V_MPEG4/ISO/AVC`` …) raise
``NotImplementedError`` by name.  Like MP3/AAC, that is a documented
boundary, not a stub: container-level metadata and frame extraction
are complete and oracle-checked.

Reference parity: the reference pipeline (BlueForty.py) has no media
path; this belongs to the engine's training-data-pipeline surface.
"""

from __future__ import annotations

import struct

# Element IDs (raw bytes, marker bit kept — RFC 8794 / Matroska spec)
EBML_HEADER = b"\x1a\x45\xdf\xa3"
DOCTYPE = b"\x42\x82"
DOCTYPE_VERSION = b"\x42\x87"
SEGMENT = b"\x18\x53\x80\x67"
INFO = b"\x15\x49\xa9\x66"
TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
DURATION = b"\x44\x89"
TRACKS = b"\x16\x54\xae\x6b"
TRACK_ENTRY = b"\xae"
TRACK_NUMBER = b"\xd7"
TRACK_UID = b"\x73\xc5"
TRACK_TYPE = b"\x83"
CODEC_ID = b"\x86"
VIDEO = b"\xe0"
PIXEL_WIDTH = b"\xb0"
PIXEL_HEIGHT = b"\xba"
AUDIO = b"\xe1"
SAMPLING_FREQUENCY = b"\xb5"
CHANNELS = b"\x9f"
CLUSTER = b"\x1f\x43\xb6\x75"
TIMESTAMP = b"\xe7"
SIMPLE_BLOCK = b"\xa3"

_COMPRESSED_VIDEO = {
    "V_VP8": "VP8",
    "V_VP9": "VP9",
    "V_AV1": "AV1",
    "V_MPEG4/ISO/AVC": "H.264/AVC",
    "V_MPEGH/ISO/HEVC": "HEVC",
    "V_THEORA": "Theora",
}


def _size(n: int) -> bytes:
    """EBML data-size varint, minimal length (marker bit in the first
    byte's position encodes the byte count)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved (unknown)
            raw = n | (1 << (7 * length))
            return raw.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _size(len(payload)) + payload


def _uint(n: int) -> bytes:
    if n == 0:
        return b"\x00"
    return n.to_bytes((n.bit_length() + 7) // 8, "big")


def _track_varint(n: int) -> bytes:
    """Track numbers inside SimpleBlocks use the same varint form as
    sizes; tracks < 127 fit one byte."""
    return _size(n)


def encode_mkv_mjpeg(
    jpeg_frames,
    width: int,
    height: int,
    fps: int = 10,
    frames_per_cluster: int = 2,
) -> bytes:
    """Wrap per-frame JPEG blobs into a minimal valid Matroska file:
    EBML header, Segment with Info (TimestampScale 1 ms, exact
    integer Duration), one V_MJPEG video TrackEntry, and the frames
    spread over multi-frame Clusters (cluster Timestamp + per-block
    16-bit relative timestamps — so a reader must do the real
    two-level timestamp arithmetic)."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    if frames_per_cluster < 1:
        raise ValueError("frames_per_cluster must be >= 1")
    n = len(jpeg_frames)
    frame_ms = 1000 // fps

    header = _elem(
        EBML_HEADER,
        _elem(DOCTYPE, b"matroska") + _elem(DOCTYPE_VERSION, b"\x04"),
    )
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, _uint(1_000_000))  # 1 ms ticks
        + _elem(DURATION, struct.pack(">d", float(n * frame_ms))),
    )
    track = _elem(
        TRACKS,
        _elem(
            TRACK_ENTRY,
            _elem(TRACK_NUMBER, _uint(1))
            + _elem(TRACK_UID, _uint(1))
            + _elem(TRACK_TYPE, _uint(1))  # video
            + _elem(CODEC_ID, b"V_MJPEG")
            + _elem(
                VIDEO,
                _elem(PIXEL_WIDTH, _uint(width))
                + _elem(PIXEL_HEIGHT, _uint(height)),
            ),
        ),
    )
    clusters = b""
    for base in range(0, n, frames_per_cluster):
        cluster_ts = base * frame_ms
        body = _elem(TIMESTAMP, _uint(cluster_ts))
        for i in range(base, min(base + frames_per_cluster, n)):
            rel = i * frame_ms - cluster_ts
            body += _elem(
                SIMPLE_BLOCK,
                _track_varint(1)
                + struct.pack(">hB", rel, 0x80)  # keyframe, no lacing
                + jpeg_frames[i],
            )
        clusters += _elem(CLUSTER, body)
    return header + _elem(SEGMENT, info + track + clusters)


def _read_varint(data: bytes, pos: int, keep_marker: bool):
    """Read one EBML varint at ``pos`` → (value, next_pos).  IDs keep
    the marker bit (raw bytes as integer); sizes strip it.  The
    all-ones size means "unknown" and returns None."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint lead byte 0x00")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw - (1 << (7 * length))
    if value == (1 << (7 * length)) - 1:
        return None, pos + length  # unknown size
    return value, pos + length


def _walk(data: bytes, pos: int, end: int):
    """Yield (id_int, payload_start, payload_end) for each child."""
    while pos < end:
        eid, pos = _read_varint(data, pos, keep_marker=True)
        size, pos = _read_varint(data, pos, keep_marker=False)
        pend = end if size is None else pos + size
        if pend > end:
            raise ValueError("EBML element extends past its parent")
        yield eid, pos, pend
        pos = pend


def _id_int(eid: bytes) -> int:
    return int.from_bytes(eid, "big")


def mkv_meta(data: bytes):
    """Container metadata: ``(doctype, timescale_ns, duration_ticks,
    tracks, n_clusters, n_blocks)`` where ``tracks`` is a list of
    ``(number, type, codec_id, width, height, channels, rate_mhz)``
    (audio rate in integer milli-hertz; -1 for fields of the other
    kind).  Duration is returned in integer ticks (the float Duration
    element divided by nothing — Matroska stores ticks of
    TimestampScale ns; exact for integer-valued doubles)."""
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != _id_int(EBML_HEADER):
        raise ValueError("not an EBML/Matroska file")
    hdr = {e: (s, t) for e, s, t in _walk(data, top[0][1], top[0][2])}
    dt = hdr.get(_id_int(DOCTYPE))
    doctype = data[dt[0] : dt[1]].decode("ascii") if dt else ""
    seg = next((x for x in top if x[0] == _id_int(SEGMENT)), None)
    if seg is None:
        raise ValueError("EBML file has no Segment")

    timescale = 1_000_000
    duration_ticks = -1
    tracks = []
    n_clusters = n_blocks = 0
    for eid, s, e in _walk(data, seg[1], seg[2]):
        if eid == _id_int(INFO):
            for i2, s2, e2 in _walk(data, s, e):
                if i2 == _id_int(TIMESTAMP_SCALE):
                    timescale = int.from_bytes(data[s2:e2], "big")
                elif i2 == _id_int(DURATION):
                    if e2 - s2 == 8:
                        (f,) = struct.unpack(">d", data[s2:e2])
                    else:
                        (f,) = struct.unpack(">f", data[s2:e2])
                    duration_ticks = int(f)
        elif eid == _id_int(TRACKS):
            for i2, s2, e2 in _walk(data, s, e):
                if i2 != _id_int(TRACK_ENTRY):
                    continue
                num = ttype = -1
                codec = ""
                w = h = ch = rate_mhz = -1
                for i3, s3, e3 in _walk(data, s2, e2):
                    if i3 == _id_int(TRACK_NUMBER):
                        num = int.from_bytes(data[s3:e3], "big")
                    elif i3 == _id_int(TRACK_TYPE):
                        ttype = int.from_bytes(data[s3:e3], "big")
                    elif i3 == _id_int(CODEC_ID):
                        codec = data[s3:e3].decode("ascii")
                    elif i3 == _id_int(VIDEO):
                        for i4, s4, e4 in _walk(data, s3, e3):
                            if i4 == _id_int(PIXEL_WIDTH):
                                w = int.from_bytes(data[s4:e4], "big")
                            elif i4 == _id_int(PIXEL_HEIGHT):
                                h = int.from_bytes(data[s4:e4], "big")
                    elif i3 == _id_int(AUDIO):
                        for i4, s4, e4 in _walk(data, s3, e3):
                            if i4 == _id_int(CHANNELS):
                                ch = int.from_bytes(data[s4:e4], "big")
                            elif i4 == _id_int(SAMPLING_FREQUENCY):
                                if e4 - s4 == 8:
                                    (f,) = struct.unpack(">d", data[s4:e4])
                                else:
                                    (f,) = struct.unpack(">f", data[s4:e4])
                                rate_mhz = int(f * 1000)
                tracks.append((num, ttype, codec, w, h, ch, rate_mhz))
        elif eid == _id_int(CLUSTER):
            n_clusters += 1
            for i2, _s2, _e2 in _walk(data, s, e):
                if i2 == _id_int(SIMPLE_BLOCK):
                    n_blocks += 1
    if not tracks:
        raise ValueError("Matroska file has no tracks")
    return doctype, timescale, duration_ticks, tracks, n_clusters, n_blocks


def decode_mkv_frames(data: bytes):
    """Per-frame (timestamp_ticks, payload) for the first video track,
    in stream order — the real two-level timestamp arithmetic
    (cluster Timestamp + signed 16-bit block offset).  V_MJPEG only;
    compressed codecs raise ``NotImplementedError`` by name."""
    doctype, _scale, _dur, tracks, _nc, _nb = mkv_meta(data)
    video = next((t for t in tracks if t[1] == 1), None)
    if video is None:
        raise ValueError("Matroska file has no video track")
    if video[2] in _COMPRESSED_VIDEO:
        raise NotImplementedError(
            f"Matroska codec {video[2]} ({_COMPRESSED_VIDEO[video[2]]}) "
            "requires an entropy/transform decoder this engine does not "
            "vendor; only V_MJPEG tracks decode"
        )
    if video[2] != "V_MJPEG":
        raise ValueError(f"unsupported Matroska video codec {video[2]!r}")
    want = video[0]

    top = list(_walk(data, 0, len(data)))
    seg = next(x for x in top if x[0] == _id_int(SEGMENT))
    frames = []
    for eid, s, e in _walk(data, seg[1], seg[2]):
        if eid != _id_int(CLUSTER):
            continue
        cluster_ts = 0
        for i2, s2, e2 in _walk(data, s, e):
            if i2 == _id_int(TIMESTAMP):
                cluster_ts = int.from_bytes(data[s2:e2], "big")
            elif i2 == _id_int(SIMPLE_BLOCK):
                tnum, p = _read_varint(data, s2, keep_marker=False)
                rel, flags = struct.unpack(">hB", data[p : p + 3])
                if flags & 0x06:
                    raise NotImplementedError(
                        "Matroska block lacing is not supported"
                    )
                if tnum == want:
                    frames.append((cluster_ts + rel, data[p + 3 : e2]))
    if not frames:
        raise ValueError("Matroska video track has no blocks")
    return frames


def mkv_frame_stats(data: bytes, every_k: int = 1):
    """Decode a V_MJPEG Matroska file and return per-SAMPLED-frame
    integer stats ``(frame_no, ts_ticks, width, height, mean_floor,
    px_min, px_max)`` — the EBML sibling of
    :func:`functions.mp4.mp4_frame_stats`, every frame through the
    vendored T.81 JPEG codec."""
    from .jpeg import decode_jpeg_gray_any

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    blobs = decode_mkv_frames(data)
    out = []
    for i in range(0, len(blobs), every_k):
        ts, blob = blobs[i]
        rows = decode_jpeg_gray_any(blob)
        h = len(rows)
        w = len(rows[0])
        total = sum(sum(r) for r in rows)
        out.append(
            (
                i,
                ts,
                w,
                h,
                total // (w * h),
                min(min(r) for r in rows),
                max(max(r) for r in rows),
            )
        )
    return out
