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


# ---------------------------------------------------------------------
# WebVTT — the W3C web-native sibling of SRT (the format YouTube/the
# <track> element serve).  Differences the parser must honor: a
# mandatory ``WEBVTT`` signature line, ``.`` (not ``,``) before the
# milliseconds, OPTIONAL hours, an optional cue identifier line above
# the time line, cue settings after the end time (``align:start``
# etc.), and NOTE/STYLE/REGION comment blocks that must be skipped.
# ---------------------------------------------------------------------

_VTT_TIME = re.compile(
    r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})"
    r" --> "
    r"(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})"
    r"(?:[ \t]+(.*))?$"
)


def _fmt_vtt(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{milli:03d}"


def encode_vtt(
    cues: list[tuple[int, int, str]], with_ids: bool = False
) -> str:
    """``cues`` = [(start_ms, end_ms, text), ...] → canonical WebVTT
    (LF line endings per the W3C spec's serialization examples)."""
    blocks = []
    for i, (start, end, text) in enumerate(cues, start=1):
        head = f"cue-{i}\n" if with_ids else ""
        blocks.append(f"{head}{_fmt_vtt(start)} --> {_fmt_vtt(end)}\n{text}")
    return "WEBVTT\n\n" + "\n\n".join(blocks) + "\n"


def parse_vtt(text: str) -> list[dict]:
    """Parse WebVTT to [{idx, cue_id, start_ms, end_ms, settings,
    text}, ...] (idx = 1-based document order).  Strict where the spec
    is strict — missing WEBVTT signature, malformed time lines, and
    end-before-start all raise — and tolerant where the wild is wild:
    BOM, CRLF, NOTE/STYLE/REGION blocks, header metadata after the
    signature on the same block."""
    norm = text.lstrip("﻿").replace("\r\n", "\n")
    blocks = re.split(r"\n\s*\n", norm.strip())
    if not blocks or not blocks[0].split("\n")[0].startswith("WEBVTT"):
        raise ValueError("not WebVTT (missing WEBVTT signature line)")
    cues = []
    for block in blocks[1:]:
        lines = block.split("\n")
        if lines[0].split(" ")[0] in ("NOTE", "STYLE", "REGION"):
            continue
        cue_id = ""
        ti = 0
        if "-->" not in lines[0]:
            cue_id = lines[0].strip()
            ti = 1
            if len(lines) < 2:
                raise ValueError(f"cue block with no time line: {block!r}")
        m = _VTT_TIME.match(lines[ti].strip())
        if not m:
            raise ValueError(f"bad WebVTT time line: {lines[ti]!r}")
        g = m.groups()
        start = (
            (int(g[0] or 0) * 60 + int(g[1])) * 60 + int(g[2])
        ) * 1000 + int(g[3])
        end = (
            (int(g[4] or 0) * 60 + int(g[5])) * 60 + int(g[6])
        ) * 1000 + int(g[7])
        if end < start:
            raise ValueError("cue ends before it starts")
        cues.append(
            {
                "idx": len(cues) + 1,
                "cue_id": cue_id,
                "start_ms": start,
                "end_ms": end,
                "settings": (g[8] or "").strip(),
                "text": "\n".join(lines[ti + 1 :]),
            }
        )
    return cues


def vtt_stats(text: str) -> dict:
    """Same alignment-audit row shape as :func:`srt_stats`."""
    cues = parse_vtt(text)
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
