"""Pure-stdlib Standard MIDI File (SMF) read/write for the symbolic-
music corpus path — the notation modality of large music datasets
(Lakh-MIDI-style corpora), sitting alongside text/image/audio in the
multimodal decode ladder.

SMF is a chunked binary container: an ``MThd`` header (format, track
count, time division) followed by ``MTrk`` chunks of delta-timed
events.  The parser handles the three things that make real files
interesting to parse and trivial to get wrong:

- variable-length quantities (7 bits per byte, MSB continuation) for
  delta times and meta/sysex lengths;
- RUNNING STATUS — a channel event may omit its status byte and
  inherit the previous one (ubiquitous in real files; the encoder
  here emits it so the parser path is exercised end-to-end);
- meta (0xFF type len data) and sysex (0xF0/0xF7 len data) events
  that must be length-skipped, including tempo (meta 0x51).

Everything is integer, so per-file stats are engine-exact and a SQL
oracle can reproduce them from the same fixture seed.
"""

from __future__ import annotations

import struct

HEADER_MAGIC = b"MThd"
TRACK_MAGIC = b"MTrk"


def write_vlq(n: int) -> bytes:
    """Variable-length quantity: big-endian 7-bit groups, MSB set on
    all but the last byte."""
    if n < 0:
        raise ValueError("VLQ must be non-negative")
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes(reversed(out))


def read_vlq(data: bytes, pos: int) -> tuple[int, int]:
    """Read a VLQ at ``pos`` → (value, new_pos)."""
    val = 0
    while True:
        b = data[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            return val, pos


def encode_midi(
    notes,
    tempo_us: int = 500_000,
    division: int = 480,
    channel: int = 0,
) -> bytes:
    """Encode (pitch, velocity, gap_ticks, dur_ticks) tuples as a
    format-0 SMF with one tempo event; note_off events reuse RUNNING
    STATUS (0x90 velocity-0 convention) so parsers must implement it.
    """
    ev = bytearray()
    ev += write_vlq(0) + bytes([0xFF, 0x51, 0x03]) + struct.pack(
        ">I", tempo_us
    )[1:]
    status = 0x90 | (channel & 0x0F)
    first = True
    for pitch, vel, gap, dur in notes:
        ev += write_vlq(gap)
        if first:  # explicit status once, running status afterwards
            ev += bytes([status])
            first = False
        ev += bytes([pitch & 0x7F, max(1, vel & 0x7F)])
        ev += write_vlq(dur)
        ev += bytes([pitch & 0x7F, 0])  # running-status note-off
    ev += write_vlq(0) + bytes([0xFF, 0x2F, 0x00])  # end of track
    head = HEADER_MAGIC + struct.pack(">IHHH", 6, 0, 1, division)
    return head + TRACK_MAGIC + struct.pack(">I", len(ev)) + bytes(ev)


def midi_stats(data: bytes):
    """Parse an SMF blob → all-integer per-file stats:
    (n_tracks, division, tempo_us, n_notes, sum_pitch, total_ticks).

    ``n_notes`` counts note-on events with velocity > 0 across all
    tracks; ``total_ticks`` is the max cumulative delta over tracks;
    ``tempo_us`` is the FIRST tempo meta event (0 when absent).
    Raises on anything that is not a parseable SMF — feature-gated,
    never silently faked."""
    if data[:4] != HEADER_MAGIC:
        raise ValueError("not an SMF file (missing MThd)")
    hlen = struct.unpack(">I", data[4:8])[0]
    fmt, n_tracks, division = struct.unpack(">HHH", data[8:14])
    if fmt not in (0, 1):
        raise NotImplementedError(f"SMF format {fmt} not supported")
    pos = 8 + hlen
    n_notes = 0
    sum_pitch = 0
    total_ticks = 0
    tempo_us = 0
    for _ in range(n_tracks):
        if data[pos : pos + 4] != TRACK_MAGIC:
            raise ValueError("missing MTrk chunk")
        tlen = struct.unpack(">I", data[pos + 4 : pos + 8])[0]
        p = pos + 8
        end = p + tlen
        ticks = 0
        status = None
        while p < end:
            delta, p = read_vlq(data, p)
            ticks += delta
            b = data[p]
            if b == 0xFF:  # meta
                mtype = data[p + 1]
                mlen, q = read_vlq(data, p + 2)
                if mtype == 0x51 and tempo_us == 0:
                    tempo_us = int.from_bytes(data[q : q + 3], "big")
                p = q + mlen
                if mtype == 0x2F:
                    break
            elif b in (0xF0, 0xF7):  # sysex: length-skipped
                slen, q = read_vlq(data, p + 1)
                p = q + slen
            else:
                if b & 0x80:
                    status = b
                    p += 1
                elif status is None:
                    raise ValueError("data byte with no running status")
                kind = status & 0xF0
                if kind in (0x80, 0x90, 0xA0, 0xB0, 0xE0):
                    d1, d2 = data[p], data[p + 1]
                    p += 2
                    if kind == 0x90 and d2 > 0:
                        n_notes += 1
                        sum_pitch += d1
                elif kind in (0xC0, 0xD0):
                    p += 1
                else:
                    raise ValueError(f"bad status byte {status:#x}")
        total_ticks = max(total_ticks, ticks)
        pos += 8 + tlen
    return n_tracks, division, tempo_us, n_notes, sum_pitch, total_ticks
