"""Pure-stdlib IMA (DVI) ADPCM — the 4-bit adaptive-delta codec used
by WAVE format tag 0x11 — for the compressed-audio decode path.

IMA ADPCM is LOSSY, but its decoder is an exactly-specified integer
recurrence (IMA "Recommended Practices for Enhancing Digital Audio
Compatibility", 1992): an 89-entry step-size table, a per-nibble index
adaptation table, and shift/add difference reconstruction with int16
clamping.  Because every operation is integer and deterministic, a SQL
oracle can replay the identical recurrence with a recursive CTE — which
is what makes a cross-engine hash-checkable fixture query possible for
a *lossy* audio format (the G.711/FLAC oracles rely on analytic or
lossless structure instead; reference parity: the BlueForty script
round-trips typed payloads through external engines the same way,
``BlueForty.py:234`` checkpoint style).

Layout facts (WAVE tag 0x11, mono): the stream is independent blocks
of ``block_align`` bytes; each block opens with a 4-byte state header
(int16 predictor — which IS the block's first output sample — then a
step-table index byte and a reserved byte) followed by packed 4-bit
codes, LOW nibble first.
"""

from __future__ import annotations

import struct

# IMA 1992 step-size table (89 entries).
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]

# Index adaptation by the low 3 bits of the code (sign bit excluded).
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def ima_decode_nibble(code: int, predictor: int, index: int):
    """One 4-bit code → (new_predictor, new_index), exact IMA integer
    recurrence: diff = step/8 + step*(b2) + step/2*(b1) + step/4*(b0),
    subtract when the sign bit (b3) is set, clamp to int16, then adapt
    the step index."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    predictor = predictor - diff if code & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + IMA_INDEX_TABLE[code & 7]))
    return predictor, index


def ima_decode_block(block: bytes):
    """Decode one mono IMA ADPCM block → list of int16 samples.  The
    header predictor is emitted as the first sample (canonical WAV
    layout: samples_per_block = (block_align - 4) * 2 + 1)."""
    predictor = struct.unpack("<h", block[:2])[0]
    index = block[2]
    if not 0 <= index <= 88:
        raise ValueError(f"IMA step index out of range: {index}")
    out = [predictor]
    for byte in block[4:]:
        for code in (byte & 0x0F, byte >> 4):  # low nibble first
            predictor, index = ima_decode_nibble(code, predictor, index)
            out.append(predictor)
    return out


def ima_decode_stream(payload: bytes, block_align: int):
    """Decode a whole mono IMA ADPCM data payload (concatenated
    independent blocks, each restarting from its own header state)."""
    samples = []
    for off in range(0, len(payload) - 3, block_align):
        samples.extend(ima_decode_block(payload[off : off + block_align]))
    return samples


def ima_encode_samples(samples, predictor: int = 0, index: int = 0):
    """Greedy IMA encoder: pick each 4-bit code by sign + magnitude
    thresholding against the current step (the standard reference
    quantizer), tracking the decoder's reconstruction so encode→decode
    is exactly reproducible.  Returns the nibble list."""
    codes = []
    for s in samples:
        step = IMA_STEP_TABLE[index]
        delta = s - predictor
        code = 0
        if delta < 0:
            code = 8
            delta = -delta
        if delta >= step:
            code |= 4
            delta -= step
        if delta >= step >> 1:
            code |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            code |= 1
        codes.append(code)
        predictor, index = ima_decode_nibble(code, predictor, index)
    return codes


def encode_wav_ima_adpcm(
    nibbles,
    framerate: int = 8000,
    predictor: int = 0,
    index: int = 0,
) -> bytes:
    """Wrap a 4-bit code stream as a single-block mono RIFF/WAVE blob
    with format tag 0x11 (IMA ADPCM), including the spec-required
    extended fmt field (samples-per-block) and ``fact`` chunk."""
    if len(nibbles) % 2:
        raise ValueError("nibble count must be even (byte packing)")
    data = struct.pack("<hBB", predictor, index, 0) + bytes(
        (nibbles[i] & 0x0F) | ((nibbles[i + 1] & 0x0F) << 4)
        for i in range(0, len(nibbles), 2)
    )
    block_align = len(data)
    samples_per_block = (block_align - 4) * 2 + 1
    byte_rate = (framerate * block_align + samples_per_block - 1) // (
        samples_per_block
    )
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, framerate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    fact = struct.pack("<I", samples_per_block)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
