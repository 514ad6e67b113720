"""Pure-stdlib MPEG audio (MP3) container parser — frame headers +
ID3v2 tags — for the compressed-audio METADATA path.

MP3 is lossy, so an engine-exact sample-level oracle is impossible by
construction (unlike :mod:`functions.flac`).  What a 100 TB audio-corpus
pipeline actually needs from MP3s *before* any transcode step is the
container metadata: frame count, sample rate, bitrate profile (CBR vs
VBR), exact duration, and tag envelope — which is precisely what
``ffprobe``-class tools compute by walking frame headers, and is fully
implementable from the public ISO/IEC 11172-3 header spec with nothing
beyond the standard library.

Implemented:

- :func:`parse_id3v2` — ID3v2 header (magic, version, syncsafe size).
- :func:`parse_mp3_stream` — walk the frame chain: 11-bit syncword,
  version/layer bits, bitrate + samplerate table lookup, padding bit,
  per-spec frame length (Layer I: ``(12·bitrate/samplerate + pad)·4``;
  Layers II/III: ``N·bitrate/samplerate + pad`` with ``N`` = 144 for
  MPEG-1 L3), samples-per-frame table, ID3v1 ``TAG`` trailer.
- :func:`encode_mp3_stream` — deterministic fixture builder: a genuine
  spec-valid header chain (real sync bits, real table indices, real
  per-spec lengths) around filler payloads.  The PAYLOAD is not real
  Huffman audio data — full MDCT/Huffman PCM decode stays an honest
  gate in :mod:`operators.multimodal` — but every byte the PARSER
  inspects is spec-true, so the parse path exercised is the real one.

DOCUMENTED BOUNDARY — metadata only, no PCM decode.  Sample-level
MPEG-1 audio synthesis (any layer) requires the tabulated
coefficients of ISO/IEC 11172-3 Annex B (the 512-tap synthesis
window, layer bit-allocation tables, Layer III Huffman code tables):
values that are published as NUMERIC TABLES, not derivable from a
closed-form formula, so a stdlib-only reimplementation cannot be
independently verified the way this repo's other codecs are (FLAC's
Rice coding, JPEG's DCT, ADPCM's integer recurrence all follow from
spec formulas).  Rather than embed a thousand unverifiable constants,
the engine draws the line at the container: everything above the
audio-synthesis layer is real and oracle-checked; PCM extraction
raises ``NotImplementedError`` in ``operators.multimodal.
decode_audio_real`` naming this boundary.  A 100 TB pipeline
transcodes lossy audio to WAV/FLAC upstream (the normal corpus
normalization step) and uses this module to TRIAGE: find MP3s, read
their duration/bitrate/tags at scan speed, route them.
"""

from __future__ import annotations

import struct

#: MPEG-1 Layer III bitrates (kbps), index 1..14; 0 = free, 15 = bad.
BITRATES_V1_L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)

#: MPEG-1 sample rates (Hz), index 0..2; 3 = reserved.
SAMPLERATES_V1 = (44100, 48000, 32000)

#: Samples per frame, MPEG-1 Layer III.
SAMPLES_PER_FRAME_V1_L3 = 1152


def syncsafe(n: int) -> bytes:
    """Encode ``n`` as an ID3v2 28-bit syncsafe integer (4 bytes)."""
    if not 0 <= n < 1 << 28:
        raise ValueError("syncsafe range")
    return bytes(
        ((n >> s) & 0x7F) for s in (21, 14, 7, 0)
    )


def unsyncsafe(b: bytes) -> int:
    if len(b) != 4 or any(x & 0x80 for x in b):
        raise ValueError("not a syncsafe int")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def frame_length(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    """MPEG-1 Layer III frame length in bytes per ISO/IEC 11172-3."""
    return (144 * bitrate_kbps * 1000) // samplerate + padding


def parse_id3v2(data: bytes) -> tuple[int, int]:
    """Return ``(tag_total_bytes, version_major)``; (0, 0) if absent.

    ``tag_total_bytes`` includes the 10-byte header, per spec.
    """
    if len(data) < 10 or data[:3] != b"ID3":
        return 0, 0
    ver = data[3]
    size = unsyncsafe(data[6:10])
    return 10 + size, ver


def parse_mp3_stream(data: bytes) -> dict:
    """Walk the MPEG frame chain and return container metadata.

    Returns a dict with: ``n_frames``, ``samplerate``,
    ``total_samples``, ``duration_ms`` (floor), ``sum_bitrate_kbps``,
    ``n_distinct_bitrates`` (1 ⇒ CBR), ``tag_bytes`` (ID3v2 envelope),
    ``has_id3v1``, ``parsed_bytes`` (must equal ``len(data)`` for a
    clean stream — trailing garbage raises).

    Only MPEG-1 Layer III is accepted; other version/layer bits raise
    ``ValueError`` (honest gate, same contract style as the FLAC
    decoder's subset).
    """
    tag_bytes, _ver = parse_id3v2(data)
    pos = tag_bytes
    n_frames = 0
    samplerate = None
    sum_bitrate = 0
    bitrates = set()
    has_id3v1 = False
    end = len(data)
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        has_id3v1 = True
        end -= 128
    while pos < end:
        if end - pos < 4:
            raise ValueError("truncated frame header")
        h = struct.unpack(">I", data[pos : pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost sync at byte {pos}")
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b01:
            raise ValueError("only MPEG-1 Layer III supported")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free/bad bitrate or reserved samplerate")
        kbps = BITRATES_V1_L3[br_idx]
        sr = SAMPLERATES_V1[sr_idx]
        if samplerate is None:
            samplerate = sr
        elif sr != samplerate:
            raise ValueError("samplerate change mid-stream")
        flen = frame_length(kbps, sr, padding)
        if pos + flen > end:
            raise ValueError("frame overruns stream")
        n_frames += 1
        sum_bitrate += kbps
        bitrates.add(kbps)
        pos += flen
    if samplerate is None:
        raise ValueError("no MPEG frames")
    total_samples = n_frames * SAMPLES_PER_FRAME_V1_L3
    return {
        "n_frames": n_frames,
        "samplerate": samplerate,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // samplerate,
        "sum_bitrate_kbps": sum_bitrate,
        "n_distinct_bitrates": len(bitrates),
        "tag_bytes": tag_bytes,
        "has_id3v1": has_id3v1,
        "parsed_bytes": len(data),
    }


def encode_mp3_stream(
    bitrate_indices: list[int],
    paddings: list[int],
    samplerate: int = 44100,
    tag_payload: bytes = b"",
    id3v1: bool = False,
) -> bytes:
    """Build a spec-valid MPEG-1 Layer III header chain (fixture).

    Each frame gets a genuine 4-byte header (sync ``0x7FF``, version
    ``0b11``, layer ``0b01``, CRC-off, the given bitrate/samplerate
    table indices and padding bit, stereo-off joint fields zeroed) and
    a filler payload sized exactly per the spec formula — so the
    parser's length arithmetic, table lookups, and sync-scan run on
    real header bytes.
    """
    sr_idx = SAMPLERATES_V1.index(samplerate)
    out = bytearray()
    if tag_payload:
        out += b"ID3" + bytes((4, 0, 0)) + syncsafe(len(tag_payload))
        out += tag_payload
    for br_idx, pad in zip(bitrate_indices, paddings):
        if not 1 <= br_idx <= 14:
            raise ValueError("bitrate index out of range")
        h = (
            (0x7FF << 21)
            | (0b11 << 19)
            | (0b01 << 17)
            | (1 << 16)  # protection off (no CRC)
            | (br_idx << 12)
            | (sr_idx << 10)
            | ((pad & 1) << 9)
        )
        hdr = struct.pack(">I", h)
        flen = frame_length(BITRATES_V1_L3[br_idx], samplerate, pad & 1)
        payload = bytes((i * 37 + br_idx) & 0xFF for i in range(flen - 4))
        out += hdr + payload
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


# ---------------------------------------------------------------------
# ID3v2.4 FRAME-level tags (title/artist/album …) — the envelope
# parse_id3v2 sizes, now opened up: real frame headers (4-char ID,
# syncsafe size, 2 flag bytes) and the three text-frame encodings the
# wild actually uses (ISO-8859-1, UTF-16 with BOM, UTF-8).  This is
# what a corpus TRIAGE reads to attribute/catalog audio before any
# transcode — all from the public id3v2.4 structure document.
# ---------------------------------------------------------------------


def encode_id3v2_frames(frames: list[tuple[str, str, int]]) -> bytes:
    """[(frame_id, text, encoding)] → a complete ID3v2.4 tag.
    ``encoding``: 0 = ISO-8859-1, 1 = UTF-16 (with BOM), 3 = UTF-8
    (the v2.4 set minus UTF-16BE).  Text frames carry the encoding
    byte, the encoded text, and a terminator per spec."""
    body = b""
    for fid, text, enc in frames:
        if len(fid) != 4 or not fid.isascii():
            raise ValueError(f"bad frame id {fid!r}")
        if enc == 0:
            payload = bytes([0]) + text.encode("latin-1") + b"\x00"
        elif enc == 1:
            payload = bytes([1]) + text.encode("utf-16") + b"\x00\x00"
        elif enc == 3:
            payload = bytes([3]) + text.encode("utf-8") + b"\x00"
        else:
            raise ValueError(f"unsupported ID3v2.4 text encoding {enc}")
        body += fid.encode("ascii") + syncsafe(len(payload)) + b"\x00\x00"
        body += payload
    return b"ID3" + bytes((4, 0, 0)) + syncsafe(len(body)) + body


def parse_id3v2_frames(data: bytes) -> list[tuple[str, str]]:
    """Walk the ID3v2 tag at the head of ``data`` → [(frame_id,
    text), ...] for text (``T…``) frames, decoding all three v2.4
    encodings; non-text frames are skipped structurally (their size
    still advances the walk).  v2.3 tags (plain 32-bit frame sizes)
    are handled too — the one structural difference that matters."""
    total, ver = parse_id3v2(data)
    if total == 0:
        return []
    if ver not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{ver} tag")
    pos = 10
    out = []
    while pos + 10 <= total:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw = data[pos + 4 : pos + 8]
        size = unsyncsafe(raw) if ver == 4 else struct.unpack(">I", raw)[0]
        frame_end = pos + 10 + size
        if frame_end > total:
            raise ValueError("ID3v2 frame overruns tag")
        if fid.startswith(b"T") and size >= 1:
            enc = data[pos + 10]
            body = data[pos + 11 : frame_end]
            if enc == 0:
                text = body.decode("latin-1")
            elif enc == 1:
                text = body.decode("utf-16")
            elif enc == 2:
                text = body.decode("utf-16-be")
            elif enc == 3:
                text = body.decode("utf-8")
            else:
                raise ValueError(f"bad ID3v2 text encoding {enc}")
            out.append((fid.decode("ascii"), text.rstrip("\x00")))
        pos = frame_end
    return out
