"""Pure-stdlib G.711 companded audio (µ-law / A-law) for the
compressed-audio decode path — the telephony/voice-corpus codec
(8-bit logarithmic PCM, 2:1 compression) sitting between raw PCM and
FLAC in the audio ladder.

Unlike table-driven codecs, G.711 is ANALYTICALLY specified (ITU-T
G.711 segment companding), so both the decoder here and a SQL oracle
can evaluate the identical integer formula — which is what makes a
cross-engine hash-checkable fixture query possible for a compressed
audio format.

- :func:`ulaw_decode_sample` / :func:`alaw_decode_sample` — one
  companded byte → int16 sample, exact integer arithmetic.
- :func:`encode_wav_g711` — wrap raw companded bytes into a real
  RIFF/WAVE container with format tag 7 (µ-law) or 6 (A-law).
- The RIFF parse + per-sample expansion lives in
  :func:`operators.multimodal.decode_audio_real`, which dispatches on
  the fmt chunk's audio-format tag.
"""

from __future__ import annotations

import struct


def ulaw_decode_sample(b: int) -> int:
    """ITU-T G.711 µ-law byte → linear int16 (bias-132 segment
    expansion; bytes are stored ones-complemented per the spec)."""
    b = ~b & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return -mag if sign else mag


def alaw_decode_sample(b: int) -> int:
    """ITU-T G.711 A-law byte → linear int16 (even-bit inversion then
    segment expansion).  Sign follows the CCITT reference
    ``alaw2linear``: bit 0x80 SET after the XOR means POSITIVE (the
    opposite of µ-law's complemented convention)."""
    b ^= 0x55
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    if exponent:
        mag = ((mantissa << 4) + 0x108) << (exponent - 1)
    else:
        mag = (mantissa << 4) + 8
    return mag if sign else -mag


def encode_wav_g711(
    companded: bytes, framerate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Wrap raw companded bytes as a mono RIFF/WAVE blob with format
    tag 7 (µ-law) or 6 (A-law) — one byte per sample."""
    fmt_tag = {"ulaw": 7, "alaw": 6}[law]
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, 1, framerate, framerate, 1, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(companded)) + companded
        + (b"\x00" if len(companded) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
