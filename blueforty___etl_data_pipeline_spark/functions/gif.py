"""Vendored pure-stdlib GIF codec (grayscale palette, animated) for
the multimodal FRAME-SAMPLING path — the video-ish sibling of
:mod:`functions.png` / :mod:`functions.jpeg`.

The container this engine is developed in has no media libraries, so
"sample frames from an animated container" would stay a stub forever.
GIF89a is an open public spec (W3C/CompuServe): a logical-screen
descriptor, palette(s), and per-frame LZW-compressed image blocks with
optional graphic-control extensions.  This module implements exactly
the subset the pipeline needs:

- :func:`encode_gif_gray` — animated GIF89a with a 256-entry
  grayscale global palette and REAL variable-width LZW compression
  (dictionary growth, clear-code resets at 4096 entries).  Used to
  build deterministic in-repo fixtures.
- :func:`decode_gif_frames` — full frame iteration for GIFs from
  other encoders too: global/local palettes, interlaced frames,
  sub-rectangle frames composited onto the logical screen (disposal
  "leave in place"), transparency via the graphic-control extension,
  deferred clear codes, and all four disposal methods (unspecified /
  leave / restore-to-background / restore-to-previous).  Each yielded
  frame is the full logical screen as a row-major grid of 0-255 GRAY
  values (palette mapped by integer luminance (2·r + 5·g + b) // 8 —
  exact integer math, so features derived from frames are
  engine-exact).

This is a decode path, not a performance path: it runs inside the
Arrow-batched ``mapInPandas`` stage where per-blob Python cost is
accepted (media decode is inherently per-blob CPU; the scale story is
partition sizing, not vectorizing the codec).
"""

from __future__ import annotations

import struct

GIF89A = b"GIF89a"


# --- LZW ---------------------------------------------------------------------


class _LZWEncoder:
    """Variable-width GIF LZW with real dictionary growth."""

    def __init__(self, min_code_size: int) -> None:
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self._acc = 0
        self._n = 0
        self._reset()

    def _reset(self) -> None:
        self.dict = {(i,): i for i in range(1 << self.min)}
        self.next_code = self.eoi + 1
        self.width = self.min + 1

    def _emit(self, code: int) -> None:
        self._acc |= code << self._n
        self._n += self.width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def encode(self, pixels) -> bytes:
        # Width sync (the classic GIF "early change"): the encoder
        # bumps as soon as next_code reaches 2^width (table full at
        # the current width); the decoder — whose table trails ours by
        # exactly one entry at read time — mirrors this by bumping at
        # 2^width − 1.  At 4096 entries (12-bit max) we emit a Clear
        # and rebuild rather than deferring.
        self._emit(self.clear)
        buf: tuple = ()
        for p in pixels:
            cand = buf + (p,)
            if cand in self.dict:
                buf = cand
                continue
            self._emit(self.dict[buf])
            if self.next_code < 4096:
                self.dict[cand] = self.next_code
                self.next_code += 1
                if self.next_code == (1 << self.width) and self.width < 12:
                    self.width += 1
            else:
                self._emit(self.clear)
                self._reset()
            buf = (p,)
        if buf:
            self._emit(self.dict[buf])
        self._emit(self.eoi)
        if self._n:
            self.out.append(self._acc & 0xFF)
        return bytes(self.out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = [(i,) for i in range(clear)] + [None, None]
    acc = 0
    n = 0
    pos = 0
    out: list[int] = []
    prev: tuple | None = None
    while len(out) < n_pixels:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [(i,) for i in range(clear)] + [None, None]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table) and table[code] is not None:
                entry = table[code]
                new = prev + (entry[0],)
            elif code == len(table):
                entry = prev + (prev[0],)
                new = entry
            else:
                raise ValueError("LZW code out of range")
            if len(table) < 4096:
                table.append(new)
                # early change: our table trails the encoder's by one
                # entry at read time, so we bump at 2^width − 1 where
                # the encoder bumps at 2^width
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return out[:n_pixels]


# --- encode ------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(frames, delay_cs: int = 10) -> bytes:
    """Encode a list of row-major 0-255 grids (all the same size) as
    an animated GIF89a with a grayscale global palette, a NETSCAPE
    loop extension, and one graphic-control extension + full-frame
    image block per frame."""
    if not frames or not frames[0] or not frames[0][0]:
        raise ValueError("need at least one non-empty frame")
    height = len(frames[0])
    width = len(frames[0][0])
    for f in frames:
        if len(f) != height or any(len(r) != width for r in f):
            raise ValueError("all frames must share one size")
    out = bytearray()
    out += GIF89A
    # logical screen descriptor: global table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale global palette
        out += bytes([i, i, i])
    # NETSCAPE 2.0 infinite loop
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        # graphic control: disposal 1 (leave), no transparency
        out += b"\x21\xf9\x04" + bytes([1 << 2]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        pixels = [v for row in f for v in row]
        lzw = _LZWEncoder(8).encode(pixels)
        out += bytes([8]) + _sub_blocks(lzw)
    out += b"\x3b"  # trailer
    return bytes(out)


# --- decode ------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(data: bytes):
    """Decode every frame of a GIF87a/89a stream to full-logical-
    screen grids of 0-255 gray values (see module doc for the exact
    palette→gray mapping).  Returns a list of frames."""
    if not (data.startswith(b"GIF89a") or data.startswith(b"GIF87a")):
        raise ValueError("not a GIF (bad signature)")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = [
            (2 * data[pos + 3 * i] + 5 * data[pos + 3 * i + 1]
             + data[pos + 3 * i + 2]) // 8
            for i in range(n)
        ]
        pos += 3 * n
    bg_gray = 0
    if global_pal is not None and _bg < len(global_pal):
        bg_gray = global_pal[_bg]
    canvas = [[bg_gray] * width for _ in range(height)]
    frames = []
    transparent = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 0x7
                # layout: size, flags, delay lo, delay hi, tindex
                transparent = (
                    data[pos + size] if gflags & 1 else None
                )
                pos += 1 + size
            # skip remaining sub-blocks (any extension)
            while True:
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = [
                (2 * data[pos + 3 * i] + 5 * data[pos + 3 * i + 1]
                 + data[pos + 3 * i + 2]) // 8
                for i in range(n)
            ]
            pos += 3 * n
        if pal is None:
            raise ValueError("image block without any palette")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            n = data[pos]
            pos += 1
            if n == 0:
                break
            lzw += data[pos : pos + n]
            pos += n
        idx = _lzw_decode(bytes(lzw), min_code, fw * fh)
        # row order (deinterlace if needed)
        if iflags & 0x40:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, fh, step))
        else:
            order = list(range(fh))
        saved = (
            [row[:] for row in canvas] if disposal == 3 else None
        )
        for src_row, dst_row in enumerate(order):
            base = src_row * fw
            row = canvas[fy + dst_row]
            for x in range(fw):
                v = idx[base + x]
                if transparent is not None and v == transparent:
                    continue
                if v >= len(pal):
                    raise ValueError("palette index out of range")
                row[fx + x] = pal[v]
        frames.append([row[:] for row in canvas])
        # disposal applies AFTER the frame is displayed, shaping what
        # the NEXT frame composites onto
        if disposal == 2:  # restore rect to background
            for yy in range(fh):
                row = canvas[fy + yy]
                for xx in range(fw):
                    row[fx + xx] = bg_gray
        elif disposal == 3 and saved is not None:  # restore previous
            canvas = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames


def gif_frame_stats(data: bytes, every_k: int = 1):
    """Decode a GIF and return per-SAMPLED-frame integer stats
    (frame_no, width, height, mean_floor, px_min, px_max) for frames
    0, k, 2k, … — the frame-sampling feature row the video pipeline
    emits.  All-integer, so engine-exact and oracle-checkable."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    frames = decode_gif_frames(data)
    out = []
    for i in range(0, len(frames), every_k):
        f = frames[i]
        h = len(f)
        w = len(f[0])
        total = sum(sum(r) for r in f)
        flat_min = min(min(r) for r in f)
        flat_max = max(max(r) for r in f)
        out.append((i, w, h, total // (w * h), flat_min, flat_max))
    return out
