"""Vendored pure-stdlib MP4 (ISO base media file format, ISO/IEC
14496-12) container codec for Motion-JPEG video — the container a
real multimodal-corpus user hits FIRST (phones, web video), ahead of
the AVI/RIFF path in :mod:`functions.avi`.

Unlike RIFF's flat chunk stream, ISO BMFF separates the media bytes
(``mdat``) from the metadata that locates them (``moov``): per-frame
offsets are DERIVED by sample-table arithmetic —

- ``stsz``  per-sample byte sizes (or one constant size),
- ``stsc``  sample→chunk runs ((first_chunk, samples_per_chunk) pairs
  that apply "until the next entry's first_chunk"),
- ``stco``/``co64``  absolute file offsets of each chunk,
- ``stts``  decode-time deltas (run-length (count, delta) pairs),

so frame i lives at ``stco[chunk(i)] + Σ sizes of the samples before
i in its chunk``.  That resolution — the part every real MP4 demuxer
implements — is exactly what :func:`decode_mp4_frames` does; the walk
also honors 64-bit large boxes (``size == 1`` + 8-byte size) and
``size == 0`` (box extends to EOF).

Codec policy mirrors the rest of the media stack: the sample
description (``stsd``) must name a codec this engine can actually
decode — ``jpeg`` (Motion-JPEG visual sample entries, decoded through
the vendored T.81 codec in :mod:`functions.jpeg`).  Compressed
codecs (``avc1``/H.264, ``hev1``/HEVC, ``vp09``, ``av01``) raise
``NotImplementedError`` naming the codec — an honest gate, never a
silent stub.

- :func:`encode_mp4_mjpeg` — minimal valid MP4: ``ftyp`` (isom),
  ``mdat`` holding the JPEG frames in MULTI-SAMPLE chunks (so the
  reader's stsc run expansion is genuinely exercised), and a full
  ``moov`` (mvhd / tkhd / mdhd / hdlr / vmhd / dinf+dref / stsd /
  stts / stsc / stsz / stco).
- :func:`decode_mp4_frames` — box walk + sample-table resolution →
  per-frame JPEG blobs in decode order.
- :func:`mp4_frame_stats` — sampled per-frame integer stats, same
  row shape as :func:`functions.avi.avi_frame_stats`.

Reference parity: the reference pipeline (BlueForty.py) has no media
path at all — this belongs to the engine's training-data-pipeline
surface (multimodal corpus curation).
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _visual_sample_entry(fmt: bytes, width: int, height: int) -> bytes:
    body = (
        b"\x00" * 6                      # reserved
        + struct.pack(">H", 1)           # data_reference_index
        + struct.pack(">HH", 0, 0)       # pre_defined, reserved
        + b"\x00" * 12                   # pre_defined[3]
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi fixed
        + struct.pack(">I", 0)           # reserved
        + struct.pack(">H", 1)           # frame_count
        + bytes([4]) + b"mjpg" + b"\x00" * 27  # compressor (pascal, 32)
        + struct.pack(">H", 24)          # depth
        + struct.pack(">h", -1)          # pre_defined
    )
    return _box(fmt, body)


def encode_mp4_mjpeg(
    jpeg_frames,
    width: int,
    height: int,
    fps: int = 10,
    samples_per_chunk: int = 2,
) -> bytes:
    """Wrap per-frame JPEG blobs into a minimal valid ISO BMFF MP4
    (``jpeg`` visual sample entries).  Frames are laid out in chunks
    of ``samples_per_chunk`` (last chunk takes the remainder), so the
    file carries a genuine multi-entry ``stsc`` for readers to
    resolve."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    n = len(jpeg_frames)
    spc = samples_per_chunk

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")

    # mdat directly after ftyp; chunk offsets are absolute file offsets
    mdat_payload = b"".join(jpeg_frames)
    mdat_start = len(ftyp) + 8
    chunk_offsets = []
    chunk_sizes = []  # samples per chunk, for stsc
    pos = mdat_start
    i = 0
    while i < n:
        take = min(spc, n - i)
        chunk_offsets.append(pos)
        chunk_sizes.append(take)
        pos += sum(len(f) for f in jpeg_frames[i : i + take])
        i += take

    # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
    stsc_entries = []
    for ci, take in enumerate(chunk_sizes, start=1):
        if not stsc_entries or stsc_entries[-1][1] != take:
            stsc_entries.append((ci, take, 1))

    timescale = fps
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n)   # times, timescale, dur
        + struct.pack(">iH", 0x00010000, 0x0100)   # rate, volume
        + b"\x00" * 10                             # reserved
        + struct.pack(
            ">9i",
            0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )                                          # unity matrix
        + b"\x00" * 24                             # pre_defined[6]
        + struct.pack(">I", 2),                    # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,                             # enabled|in_movie|preview
        struct.pack(">IIIII", 0, 0, 1, 0, n)       # times, id, rsvd, dur
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)         # layer, group, vol, rsvd
        + struct.pack(
            ">9i",
            0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n)
        + struct.pack(">HH", 0x55C4, 0),           # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _visual_sample_entry(b"jpeg", width, height),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _walk_children(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each child box,
    honoring 64-bit large sizes and size==0 (to end)."""
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        payload_start = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 large box")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            payload_start = pos + 16
        elif size == 0:
            size = end - pos
        box_end = pos + size
        if size < 8 or box_end > end:
            raise ValueError(f"truncated MP4 box {fourcc!r}")
        yield fourcc, payload_start, box_end
        pos = box_end


def _find(data: bytes, pos: int, end: int, *path: bytes):
    """Resolve a nested box path; returns (payload_start, payload_end)
    or None."""
    for name in path:
        found = None
        for fourcc, ps, pe in _walk_children(data, pos, end):
            if fourcc == name:
                found = (ps, pe)
                break
        if found is None:
            return None
        pos, end = found
    return pos, end


_COMPRESSED_CODECS = {
    b"avc1": "H.264/AVC",
    b"avc3": "H.264/AVC",
    b"hev1": "HEVC",
    b"hvc1": "HEVC",
    b"vp09": "VP9",
    b"av01": "AV1",
    b"mp4v": "MPEG-4 Visual",
}


def decode_mp4_frames(data: bytes):
    """Walk the box tree, resolve the video track's sample tables, and
    return the per-frame JPEG blobs in decode order.

    Validates the ``ftyp`` signature, requires a ``jpeg`` sample entry
    (compressed codecs raise ``NotImplementedError`` by name), and
    derives each sample's absolute offset from stsc×stco×stsz — the
    real demuxer arithmetic, not a linear scan for JPEG magics."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp box)")

    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    stbl = _find(
        data, moov[0], moov[1], b"trak", b"mdia", b"minf", b"stbl"
    )
    if stbl is None:
        raise ValueError("MP4 video track has no sample table")
    s, e = stbl

    boxes = {fcc: (ps, pe) for fcc, ps, pe in _walk_children(data, s, e)}
    for req in (b"stsd", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"MP4 sample table missing {req.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("MP4 sample table missing stco/co64")

    # stsd: codec gate
    ps, pe = boxes[b"stsd"]
    entry_fmt = data[ps + 12 : ps + 16]
    if entry_fmt in _COMPRESSED_CODECS:
        raise NotImplementedError(
            f"MP4 codec {entry_fmt.decode()} ({_COMPRESSED_CODECS[entry_fmt]}) "
            "requires an entropy/transform decoder this engine does not "
            "vendor; only Motion-JPEG ('jpeg') tracks decode"
        )
    if entry_fmt != b"jpeg":
        raise ValueError(f"unsupported MP4 sample entry {entry_fmt!r}")

    # stsz: per-sample sizes (or one constant)
    ps, pe = boxes[b"stsz"]
    const_size, n = struct.unpack(">II", data[ps + 4 : ps + 12])
    if const_size:
        sizes = [const_size] * n
    else:
        sizes = list(
            struct.unpack(f">{n}I", data[ps + 12 : ps + 12 + 4 * n])
        )

    # stco / co64: chunk offsets
    if b"stco" in boxes:
        ps, pe = boxes[b"stco"]
        (n_chunks,) = struct.unpack(">I", data[ps + 4 : ps + 8])
        offsets = struct.unpack(
            f">{n_chunks}I", data[ps + 8 : ps + 8 + 4 * n_chunks]
        )
    else:
        ps, pe = boxes[b"co64"]
        (n_chunks,) = struct.unpack(">I", data[ps + 4 : ps + 8])
        offsets = struct.unpack(
            f">{n_chunks}Q", data[ps + 8 : ps + 8 + 8 * n_chunks]
        )

    # stsc: expand (first_chunk, samples_per_chunk) runs over chunks
    ps, pe = boxes[b"stsc"]
    (n_runs,) = struct.unpack(">I", data[ps + 4 : ps + 8])
    runs = [
        struct.unpack(">III", data[ps + 8 + 12 * i : ps + 20 + 12 * i])
        for i in range(n_runs)
    ]
    per_chunk = []
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < n_runs else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise ValueError("MP4 stsc runs do not cover the chunk list")

    frames = []
    sample = 0
    for ci in range(n_chunks):
        off = offsets[ci]
        for _ in range(per_chunk[ci]):
            if sample >= n:
                break
            size = sizes[sample]
            if off + size > len(data):
                raise ValueError("MP4 sample extends past end of file")
            frames.append(data[off : off + size])
            off += size
            sample += 1
    if sample != n:
        raise ValueError("MP4 chunk layout does not cover all samples")
    if not frames:
        raise ValueError("MP4 contains no video samples")
    return frames


def mp4_frame_stats(data: bytes, every_k: int = 1):
    """Decode an MJPEG MP4 and return per-SAMPLED-frame integer stats
    (frame_no, width, height, mean_floor, px_min, px_max) — the same
    row shape as :func:`functions.avi.avi_frame_stats`, every frame
    decoded through the vendored T.81 JPEG codec."""
    from .jpeg import decode_jpeg_gray_any

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    blobs = decode_mp4_frames(data)
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


# ---------------------------------------------------------------------
# Track-level metadata (video AND audio tracks) — the ffprobe-class
# readout a multimodal corpus pipeline runs to TRIAGE ISO-BMFF media
# (.mp4/.m4a/.mov) before any decode: codec, timescale-exact duration,
# sample count, dimensions or channel layout.  Like functions/mp3.py,
# this is a METADATA boundary for compressed codecs: AAC synthesis
# needs the ISO/IEC 14496-3 tabulated Huffman/MDCT-window tables this
# engine does not vendor, so sample-level audio decode stays an honest
# NotImplementedError in operators.multimodal.decode_audio_real.
# ---------------------------------------------------------------------

#: ISO/IEC 14496-3 sampling-frequency index (AudioSpecificConfig).
AAC_SAMPLERATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)


def _esds(samplerate: int, channels: int) -> bytes:
    """Real MPEG-4 ES_Descriptor chain for AAC-LC: ES(0x03) →
    DecoderConfig(0x04, objectTypeIndication 0x40, streamType audio) →
    DecoderSpecificInfo(0x05, AudioSpecificConfig: 5-bit AOT=2,
    4-bit frequency index, 4-bit channel configuration)."""
    freq_idx = AAC_SAMPLERATES.index(samplerate)
    asc_bits = (2 << 11) | (freq_idx << 7) | (channels << 3)
    asc = struct.pack(">H", asc_bits)
    dsi = bytes([0x05, len(asc)]) + asc
    dcd_body = (
        bytes([0x40, (0x05 << 2) | 1])  # OTI=AAC, streamType=audio
        + (0).to_bytes(3, "big")        # bufferSizeDB
        + struct.pack(">II", 0, 0)      # max/avg bitrate (unset)
        + dsi
    )
    dcd = bytes([0x04, len(dcd_body)]) + dcd_body
    es_body = struct.pack(">HB", 1, 0) + dcd  # ES_ID=1, no flags
    es = bytes([0x03, len(es_body)]) + es_body
    return _full(b"esds", 0, 0, es)


def _audio_sample_entry(
    fmt: bytes, channels: int, samplerate: int, extra: bytes = b""
) -> bytes:
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)           # data_reference_index
        + b"\x00" * 8                    # reserved[2]
        + struct.pack(">HH", channels, 16)
        + struct.pack(">HH", 0, 0)       # pre_defined, reserved
        + struct.pack(">I", samplerate << 16)
        + extra
    )
    return _box(fmt, body)


def encode_m4a_aac(
    frame_sizes,
    samplerate: int = 44100,
    channels: int = 2,
) -> bytes:
    """Build a spec-valid .m4a container around AAC-LC-shaped frames:
    M4A ftyp, mdat holding one filler payload per frame (the PAYLOAD
    is not real AAC entropy data — sample-level decode stays an honest
    gate — but every byte the METADATA path inspects is spec-true:
    real esds descriptor chain, real sample tables, 1024-sample AAC
    frame timing).  The fixture twin of functions/mp3.py's
    encode_mp3_stream, container edition."""
    if not frame_sizes:
        raise ValueError("need at least one frame")
    if samplerate not in AAC_SAMPLERATES:
        raise ValueError(f"not an AAC sampling rate: {samplerate}")
    if not 1 <= channels <= 7:
        raise ValueError("AAC channel configuration must be 1..7")
    n = len(frame_sizes)
    frames = [bytes((i + j) & 0xFF for j in range(sz))
              for i, sz in enumerate(frame_sizes)]

    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A mp42isom")
    mdat_start = len(ftyp) + 8
    duration = n * 1024  # AAC-LC frame = 1024 PCM samples

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, samplerate, duration)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0x0100, 0)
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        )
        + struct.pack(">II", 0, 0),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, samplerate, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"aac\x00",
    )
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + _audio_sample_entry(
            b"mp4a", channels, samplerate, _esds(samplerate, channels)
        ),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1024))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", b"".join(frames)) + moov


def _read_descriptor(data: bytes, pos: int):
    """MPEG-4 descriptor header: tag byte + expandable length (7 bits
    per byte, high bit = continue).  Returns (tag, length, body_pos)."""
    tag = data[pos]
    pos += 1
    length = 0
    for _ in range(4):
        b = data[pos]
        pos += 1
        length = (length << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    return tag, length, pos


def _aac_object_type(esds_payload: bytes) -> int | None:
    """objectTypeIndication from an esds box payload (after the
    version/flags word), or None if the chain is malformed."""
    pos = 0
    tag, ln, pos = _read_descriptor(esds_payload, pos)
    if tag != 0x03:
        return None
    pos += 3  # ES_ID + flags byte (no optional fields in our profile)
    tag, ln, pos = _read_descriptor(esds_payload, pos)
    if tag != 0x04:
        return None
    return esds_payload[pos]


def mp4_track_meta(data: bytes):
    """ffprobe-class track readout from an ISO BMFF file: one tuple
    per trak —

    ``(track_id, handler, codec, timescale, duration, n_samples,
    width, height, channels, samplerate)``

    with width/height populated for ``vide`` tracks, channels /
    samplerate for ``soun`` tracks (the other pair -1), and for
    ``mp4a`` entries the codec refined via the real esds descriptor
    walk (objectTypeIndication 0x40 → ``'mp4a.40'``, AAC).  Duration
    is exact in the track's own timescale — no float seconds."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp box)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("ISO BMFF file has no moov box")

    out = []
    for fcc, ps, pe in _walk_children(data, moov[0], moov[1]):
        if fcc != b"trak":
            continue
        tkhd = _find(data, ps, pe, b"tkhd")
        if tkhd is None:
            raise ValueError("trak missing tkhd")
        # version-1 tkhd carries 64-bit creation/modification times, so
        # track_id sits at +20 instead of +12 (ISO 14496-12 §8.3.2) —
        # real-world files use v1, and reading +12 there returns the
        # low half of modification_time as a garbage id.
        tkhd_version = data[tkhd[0]]
        tid_off = tkhd[0] + (20 if tkhd_version == 1 else 12)
        track_id = struct.unpack(">I", data[tid_off : tid_off + 4])[0]
        mdia = _find(data, ps, pe, b"mdia")
        if mdia is None:
            raise ValueError("trak missing mdia")
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if mdhd is None or hdlr is None:
            raise ValueError("mdia missing mdhd/hdlr")
        version = data[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack(
                ">IQ", data[mdhd[0] + 20 : mdhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", data[mdhd[0] + 12 : mdhd[0] + 20]
            )
        handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii")

        stbl = _find(data, mdia[0], mdia[1], b"minf", b"stbl")
        if stbl is None:
            raise ValueError("trak missing sample table")
        boxes = {
            f: (a, b) for f, a, b in _walk_children(data, stbl[0], stbl[1])
        }
        es, ee = boxes[b"stsd"]
        entry_fmt = data[es + 12 : es + 16]
        codec = entry_fmt.decode("ascii", "replace")
        n_samples = struct.unpack(
            ">I", data[boxes[b"stsz"][0] + 8 : boxes[b"stsz"][0] + 12]
        )[0]

        width = height = channels = samplerate = -1
        entry_body = es + 16  # past size+fourcc of the sample entry
        if handler == "vide":
            width, height = struct.unpack(
                ">HH", data[entry_body + 24 : entry_body + 28]
            )
        elif handler == "soun":
            channels = struct.unpack(
                ">H", data[entry_body + 16 : entry_body + 18]
            )[0]
            samplerate = struct.unpack(
                ">I", data[entry_body + 24 : entry_body + 28]
            )[0] >> 16
            if entry_fmt == b"mp4a":
                esds = _find(data, entry_body + 28, ee, b"esds")
                if esds is not None:
                    oti = _aac_object_type(data[esds[0] + 4 : esds[1]])
                    if oti is not None:
                        codec = f"mp4a.{oti:02x}"
        out.append(
            (
                track_id, handler, codec, timescale, duration,
                n_samples, width, height, channels, samplerate,
            )
        )
    if not out:
        raise ValueError("ISO BMFF file has no tracks")
    return out
