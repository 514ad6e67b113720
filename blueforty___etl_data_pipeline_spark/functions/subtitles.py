"""SubRip (SRT) subtitle codec — the video-text-alignment arm of the
multimodal ingest path.

Video training corpora pair frames with time-aligned transcripts; the
transcript container seen in the wild is overwhelmingly SRT (an open
de-facto format: numbered cues, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
time ranges, blank-line separation, optional multi-line text).  It is
pure text with millisecond-integer timestamps, so the parse is
engine-exact — the subtitle sibling of the MIDI/EXIF container
queries.

- :func:`encode_srt` — cues → canonical SRT text (CRLF, 1-based
  indices).
- :func:`parse_srt` — real parser: tolerant of LF or CRLF and of
  trailing blank lines, strict about the cue-index line, the arrow
  time line, and ``mmm`` zero-padding; multi-line cue text joins with
  ``\\n``.  Malformed time lines raise ``ValueError``.
- :func:`srt_stats` — cue count, first start / last end, total
  speech duration, overlap count, text chars — the alignment-level
  stats a corpus auditor needs before any ASR/vision work.
"""

from __future__ import annotations

import re

_TIME = re.compile(
    r"^(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})"
    r" --> "
    r"(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})$"
)


def _fmt(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"


def encode_srt(cues: list[tuple[int, int, str]]) -> str:
    """``cues`` = [(start_ms, end_ms, text), ...] in display order."""
    blocks = []
    for i, (start, end, text) in enumerate(cues, start=1):
        blocks.append(f"{i}\r\n{_fmt(start)} --> {_fmt(end)}\r\n{text}")
    return "\r\n\r\n".join(blocks) + "\r\n"


def parse_srt(text: str) -> list[dict]:
    """Parse SRT text to [{idx, start_ms, end_ms, text}, ...]."""
    norm = text.replace("\r\n", "\n")
    cues = []
    for block in re.split(r"\n\s*\n", norm.strip()):
        lines = block.split("\n")
        if len(lines) < 2:
            raise ValueError(f"truncated cue block: {block!r}")
        try:
            idx = int(lines[0].strip())
        except ValueError as e:
            raise ValueError(f"bad cue index line: {lines[0]!r}") from e
        m = _TIME.match(lines[1].strip())
        if not m:
            raise ValueError(f"bad time line: {lines[1]!r}")
        g = [int(x) for x in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        if end < start:
            raise ValueError(f"cue {idx} ends before it starts")
        cues.append(
            {
                "idx": idx,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(lines[2:]),
            }
        )
    return cues


def srt_stats(text: str) -> dict:
    cues = parse_srt(text)
    overlaps = sum(
        1
        for a, b in zip(cues, cues[1:])
        if b["start_ms"] < a["end_ms"]
    )
    return {
        "n_cues": len(cues),
        "first_start_ms": cues[0]["start_ms"] if cues else None,
        "last_end_ms": cues[-1]["end_ms"] if cues else None,
        "speech_ms": sum(c["end_ms"] - c["start_ms"] for c in cues),
        "n_overlaps": overlaps,
        "text_chars": sum(len(c["text"]) for c in cues),
    }
