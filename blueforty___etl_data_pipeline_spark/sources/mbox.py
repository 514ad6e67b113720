"""mbox mailbox source (RFC 4155) — mailing-list archives are a
classic text-corpus modality (LKML, Apache lists, Enron), shipped as
mbox files: messages concatenated, each introduced by a ``From ``
separator line, with ``>From`` quoting protecting body lines that
would otherwise look like separators (the mboxrd convention).

Stdlib end to end: the splitter implements the real framing rules
(separator only at message start / after a blank line; ``>From ``
unquoting on read), and the per-message parse rides ``email`` — the
reference RFC 5322/2047 implementation — for headers (incl.
encoded-word decoding) and body extraction (text/plain parts of
multipart messages; non-text parts counted, not decoded).

Scale shape: one mbox per task (``binaryFile``), messages exploded
in an Arrow-batched stage — zero shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


def build_mbox(messages: list[tuple[str, str, str, str]]) -> bytes:
    """[(from_addr, date, subject, body)] → RFC 4155 mbox bytes with
    proper ``>From`` quoting of body lines (mboxrd)."""
    out = []
    for from_addr, date, subject, body in messages:
        quoted = "\n".join(
            (">" + ln) if ln.lstrip(">").startswith("From ") else ln
            for ln in body.split("\n")
        )
        out.append(
            f"From {from_addr} {date}\n"
            f"From: {from_addr}\n"
            f"Date: {date}\n"
            f"Subject: {subject}\n"
            "\n"
            f"{quoted}\n"
        )
    return "\n".join(out).encode("utf-8")


def split_mbox(data: bytes) -> list[bytes]:
    """mbox bytes → one raw RFC 5322 message per element.  A
    ``From `` line counts as a separator only at file start or right
    after a blank line (the RFC 4155 rule — naive splitting corrupts
    any message quoting another mail)."""
    if not data.startswith(b"From "):
        raise ValueError("not an mbox (first line is not a From_ line)")
    lines = data.split(b"\n")
    messages: list[list[bytes]] = []
    prev_blank = True
    for ln in lines:
        if ln.startswith(b"From ") and prev_blank:
            messages.append([])
        else:
            if not messages:
                raise ValueError("mbox body before any From_ line")
            # mboxrd unquoting: '>From ' -> 'From ' (one level)
            if ln.startswith(b">") and ln.lstrip(b">").startswith(b"From "):
                ln = ln[1:]
            messages[-1].append(ln)
        prev_blank = ln == b""
    return [b"\n".join(m).strip(b"\n") for m in messages]


def parse_message(raw: bytes) -> dict:
    """One RFC 5322 message → {from_addr, subject, date, body_text,
    n_parts} via the stdlib reference parser; multipart messages
    yield the concatenated text/plain parts."""
    import email
    import email.policy

    msg = email.message_from_bytes(raw, policy=email.policy.default)
    texts = []
    n_parts = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        n_parts += 1
        if part.get_content_type() == "text/plain":
            texts.append(part.get_content())
    return {
        "from_addr": str(msg.get("From", "")),
        "subject": str(msg.get("Subject", "")),
        "date": str(msg.get("Date", "")),
        "body_text": "".join(texts).rstrip("\n"),
        "n_parts": n_parts,
    }


def read_mbox(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed mbox ingest: one row per message —
    (file, msg_no, from_addr, subject, date, body_chars, n_parts)."""
    import os

    base, leaf = os.path.split(path_glob)
    if any(c in leaf for c in "*?["):
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", leaf)
            .load(base)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                for i, raw in enumerate(split_mbox(bytes(blob))):
                    m = parse_message(raw)
                    rows.append(
                        (
                            name, i, m["from_addr"], m["subject"],
                            m["date"], len(m["body_text"]),
                            m["n_parts"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "msg_no", "from_addr", "subject", "date",
                    "body_chars", "n_parts",
                ],
            )

    return files.select("path", "content").mapInPandas(
        run,
        schema=(
            "file string, msg_no int, from_addr string, "
            "subject string, date string, body_chars int, n_parts int"
        ),
    )
