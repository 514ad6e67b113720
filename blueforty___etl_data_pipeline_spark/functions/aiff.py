"""Vendored pure-stdlib AIFF (Audio IFF, Apple 1988) codec — the
big-endian cousin of RIFF/WAVE and the third uncompressed-audio
container next to WAV (:func:`operators.multimodal.encode_wav_pcm16`)
and FLAC (:mod:`functions.flac`).  The stdlib ``aifc`` module was
removed in Python 3.13, so the walk is vendored from the public spec
(Apple "Audio Interchange File Format: AIFF-1.3").

Structure: ``FORM <size> AIFF`` containing a ``COMM`` chunk (channels
u16, numSampleFrames u32, sampleSize u16, sampleRate as an 80-bit IEEE
754 EXTENDED float — the format's famous quirk) and an ``SSND`` chunk
(offset u32, blockSize u32, big-endian PCM).  Odd-length chunks pad one
byte, like RIFF.

- :func:`encode_aiff_pcm16` — minimal valid one-channel 16-bit AIFF.
- :func:`parse_aiff_meta` — chunk walk tolerant of unknown chunks;
  returns COMM fields plus integer-exact PCM stats.  Non-IFF input
  raises ``ValueError``.
"""

from __future__ import annotations

import struct


def _f80_encode(rate: int) -> bytes:
    """Positive integer → 80-bit extended float (u16 biased exponent,
    u64 mantissa with explicit leading 1)."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    k = rate.bit_length() - 1
    mantissa = rate << (63 - k)
    return struct.pack(">HQ", 16383 + k, mantissa)


def _f80_decode(b: bytes) -> int:
    """80-bit extended float → nearest integer rate (covers every rate
    an integer encoder can produce; subnormals/NaN are rejected)."""
    exponent, mantissa = struct.unpack(">HQ", b)
    if exponent in (0, 0x7FFF) or not mantissa >> 63:
        raise ValueError("unsupported extended-float sample rate")
    shift = 63 - (exponent - 16383)
    if shift < 0:
        return mantissa << -shift
    if shift > 63:
        return 0
    half = 1 << (shift - 1) if shift else 0
    return (mantissa + half) >> shift if shift else mantissa


def encode_aiff_pcm16(
    samples: list[int], sample_rate: int = 8000
) -> bytes:
    pcm = b"".join(
        struct.pack(">h", max(-32768, min(32767, s))) for s in samples
    )
    comm = struct.pack(">HIH", 1, len(samples), 16) + _f80_encode(
        sample_rate
    )
    ssnd = struct.pack(">II", 0, 0) + pcm

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack(">I", len(payload)) + payload + pad

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def parse_aiff_meta(blob: bytes) -> dict:
    """Walk the IFF chunks; return channels / n_frames / sample_bits /
    sample_rate from COMM plus integer PCM stats from SSND."""
    if len(blob) < 12 or blob[:4] != b"FORM" or blob[8:12] != b"AIFF":
        raise ValueError("not an AIFF FORM")
    pos, end = 12, 8 + struct.unpack(">I", blob[4:8])[0]
    meta: dict = {}
    samples: list[int] = []
    while pos + 8 <= min(end, len(blob)):
        cid = blob[pos : pos + 4]
        size = struct.unpack(">I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            if len(payload) < 18:
                raise ValueError("truncated COMM chunk")
            ch, nf, bits = struct.unpack(">HIH", payload[:8])
            meta.update(
                n_channels=ch,
                n_frames=nf,
                sample_bits=bits,
                sample_rate=_f80_decode(payload[8:18]),
            )
        elif cid == b"SSND":
            if len(payload) < 8:
                raise ValueError("truncated SSND chunk")
            off = struct.unpack(">I", payload[:4])[0]
            pcm = payload[8 + off :]
            samples = [
                struct.unpack(">h", pcm[i : i + 2])[0]
                for i in range(0, len(pcm) - 1, 2)
            ]
        pos += 8 + size + (size & 1)
    if "n_frames" not in meta:
        raise ValueError("AIFF without COMM chunk")
    meta["peak_abs"] = max((abs(s) for s in samples), default=0)
    meta["sum_abs"] = sum(abs(s) for s in samples)
    return meta
