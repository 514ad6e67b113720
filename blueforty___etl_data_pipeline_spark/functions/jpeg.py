"""Vendored pure-stdlib baseline JPEG codec (grayscale, 8-bit) for the
multimodal decode path — the JPEG sibling of :mod:`functions.png`.

The container this engine is developed in has no image libraries, so
the "real decode" step for JPEG blobs (the format a training-data user
hits FIRST) would otherwise stay a PIL-gated stub forever.  Baseline
JPEG is an open public spec (ITU-T T.81 / ISO 10918-1): the bitstream
is markers + Huffman-coded quantized DCT blocks, all implementable
with nothing beyond the standard library.  This module implements
exactly the subset the pipeline needs:

- :func:`encode_jpeg_gray` — baseline sequential, 8-bit grayscale,
  single component (1×1 sampling), one DQT + custom canonical Huffman
  tables (fixed 4-bit DC / 8-bit AC codes — legal per the spec, which
  lets decoders read the tables from the DHT segments).  Used to
  build deterministic in-repo fixtures.
- :func:`decode_jpeg_gray` — full baseline-grayscale decode for
  JPEGs from *other* encoders too: arbitrary DQT/DHT tables read
  from the stream, byte unstuffing, DC prediction, EOB/ZRL runs,
  dequantize → inverse zigzag → float IDCT → round + clamp.
  Restart intervals (DRI + RSTn) and 16-bit quantization tables are
  handled; anything outside that subset (color, arithmetic coding)
  raises ``ValueError`` — the caller treats that as "needs PIL".

This is a decode path, not a performance path: it runs inside the
Arrow-batched ``mapInPandas`` stage where the per-blob Python cost is
already accepted (media decode is inherently per-blob CPU work; the
scale story is partition sizing, not vectorizing the codec).

Determinism anchor for oracles: an 8×8 block that is CONSTANT has
only a DC coefficient (8·(v−128)); with the default flat quant table
of 8s the quantized DC is exactly v−128, so block-constant images
round-trip LOSSLESSLY — which is what makes a DuckDB-checkable
fixture query possible for a lossy format.
"""

from __future__ import annotations

import math
import struct

SOI = b"\xff\xd8"

#: natural index of each zigzag position (T.81 Figure 5)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7

#: default flat quantization table (natural order): q=8 everywhere
#: makes the DC of a constant block exactly v-128 (see module doc).
DEFAULT_QUANT = tuple([8] * 64)

# Encoder Huffman tables, canonical: DC categories 0..11 as 4-bit
# codes 0..11; the 162 AC symbols (EOB, ZRL, and (run 0..15, size
# 1..10)) as 8-bit codes in list order.  Fully legal baseline tables;
# decoders read them from the DHT segments we emit.
_DC_SYMBOLS = tuple(range(12))
_AC_SYMBOLS = (0x00, 0xF0) + tuple(
    (run << 4) | size for run in range(16) for size in range(1, 11)
)


def _canonical_codes(symbols, length):
    return {sym: (length, i) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, 4)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 8)


def _dht_segment(table_class: int, dest: int, symbols, length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(table_class << 4) | dest]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for shift in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> shift) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc
                self.buf.append(b)
                if b == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad final byte with 1-bits (spec)


def _fdct(block):
    tmp = [
        [
            _C[v] / 2.0 * sum(block[x][y] * _COS[y][v] for y in range(8))
            for v in range(8)
        ]
        for x in range(8)
    ]
    return [
        [
            _C[u] / 2.0 * sum(tmp[x][v] * _COS[x][u] for x in range(8))
            for v in range(8)
        ]
        for u in range(8)
    ]


def _idct(coef):
    tmp = [
        [
            sum(_C[v] / 2.0 * coef[u][v] * _COS[y][v] for v in range(8))
            for y in range(8)
        ]
        for u in range(8)
    ]
    return [
        [
            sum(_C[u] / 2.0 * tmp[u][y] * _COS[x][u] for u in range(8))
            for y in range(8)
        ]
        for x in range(8)
    ]


def _bitlen(v: int) -> int:
    return v.bit_length()


def encode_jpeg_gray(pixels, quant=None, restart_interval=0) -> bytes:
    """Encode a row-major grid of 0-255 ints as a baseline sequential
    8-bit grayscale JPEG (single component, 1×1 sampling).  ``quant``
    is a 64-entry natural-order quantization table (default: flat 8s);
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many blocks (DC prediction resets — the random-access /
    error-resilience feature real encoders use on large images).
    Raises ``ValueError`` on ragged/empty input or if a quantized AC
    coefficient needs a magnitude category above 10 (the table limit —
    use a coarser quant table)."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    if any(len(row) != width for row in pixels):
        raise ValueError("ragged pixel grid")
    q = list(quant) if quant is not None else list(DEFAULT_QUANT)
    if len(q) != 64 or any(not (1 <= x <= 255) for x in q):
        raise ValueError("quant table must be 64 entries in 1..255")

    # pad to block multiples by edge replication
    h8 = (height + 7) // 8 * 8
    w8 = (width + 7) // 8 * 8
    grid = [
        [pixels[min(y, height - 1)][min(x, width - 1)] for x in range(w8)]
        for y in range(h8)
    ]

    bw = _BitWriter()
    dc_prev = 0
    n_done = 0
    for by in range(0, h8, 8):
        for bx in range(0, w8, 8):
            if restart_interval and n_done and n_done % restart_interval == 0:
                bw.flush()
                bw.buf += bytes(
                    [0xFF, 0xD0 + (n_done // restart_interval - 1) % 8]
                )
                dc_prev = 0
            n_done += 1
            block = [
                [grid[by + y][bx + x] - 128 for x in range(8)]
                for y in range(8)
            ]
            coef = _fdct(block)
            zz = []
            for k in range(64):
                nat = ZIGZAG[k]
                zz.append(int(round(coef[nat // 8][nat % 8] / q[nat])))
            diff = zz[0] - dc_prev
            dc_prev = zz[0]
            cat = _bitlen(abs(diff))
            if cat > 11:
                raise ValueError("DC difference out of category range")
            length, code = _DC_CODES[cat]
            bw.write(code, length)
            if cat:
                mag = diff if diff > 0 else diff + (1 << cat) - 1
                bw.write(mag, cat)
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = _AC_CODES[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _bitlen(abs(v))
                if size > 10:
                    raise ValueError(
                        "AC coefficient too large for the 10-bit "
                        "category limit; use a coarser quant table"
                    )
                length, code = _AC_CODES[(run << 4) | size]
                bw.write(code, length)
                mag = v if v > 0 else v + (1 << size) - 1
                bw.write(mag, size)
                run = 0
            if run:
                length, code = _AC_CODES[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        q[ZIGZAG[k]] for k in range(64)
    )
    sof0 = b"\xff\xc0" + struct.pack(
        ">HBHHB", 11, 8, height, width, 1
    ) + bytes([1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        SOI
        + dqt
        + sof0
        + dri
        + _dht_segment(0, 0, _DC_SYMBOLS, 4)
        + _dht_segment(1, 0, _AC_SYMBOLS, 8)
        + sos
        + bytes(bw.buf)
        + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy-coded data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn restart marker: discard the partial byte
        (the encoder pads with 1-bits before the marker), then expect
        0xFFD0–0xFFD7."""
        self._n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated at restart marker")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn restart marker")
        self.pos += 2


def _build_huff(counts, symbols):
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _decode_sym(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(data: bytes):
    """Decode a baseline sequential 8-bit grayscale JPEG to a
    row-major grid of 0-255 ints.  Supports arbitrary (stream-read)
    quantization and Huffman tables, byte unstuffing, EOB/ZRL runs
    and DC prediction; raises ``ValueError`` on anything outside the
    baseline-grayscale subset (progressive/extended/lossless frames,
    color, 16-bit quant tables, restart intervals, arithmetic coding,
    truncation)."""
    if not data.startswith(SOI):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant = {}
    huff = {}
    dims = None  # (height, width)
    scan = None  # (dc_table_id, ac_table_id, quant_id, data_pos)
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (8- or 16-bit precision)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                w = 2 if pq else 1
                if i + 1 + 64 * w > len(body):
                    raise ValueError("truncated DQT")
                tbl = [0] * 64
                for k in range(64):
                    if pq:
                        tbl[ZIGZAG[k]] = (
                            body[i + 1 + 2 * k] << 8
                        ) | body[i + 2 + 2 * k]
                    else:
                        tbl[ZIGZAG[k]] = body[i + 1 + k]
                quant[tq] = tbl
                i += 1 + 64 * w
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                symbols = list(body[i + 17:i + 17 + n])
                if len(symbols) != n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _build_huff(counts, symbols)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale)")
            hv, tq = body[7], body[8]
            if hv != 0x11:
                raise ValueError("only 1x1 sampling supported")
            dims = (height, width)
            sof_tq = tq
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG frame unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans")
            tdta = body[2]
            scan = (tdta >> 4, tdta & 0xF, pos + seglen)
            break
        # APPn / COM / others: skip
        pos += seglen
    if dims is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    if sof_tq not in quant:
        raise ValueError("missing quantization table")
    dc_id, ac_id, data_pos = scan
    if (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("missing huffman table")
    q = quant[sof_tq]
    dctab = huff[(0, dc_id)]
    actab = huff[(1, ac_id)]
    height, width = dims
    bh = (height + 7) // 8
    bw_ = (width + 7) // 8
    br = _BitReader(data, data_pos)
    out = [[0] * (bw_ * 8) for _ in range(bh * 8)]
    pred = 0
    n_done = 0
    for byi in range(bh):
        for bxi in range(bw_):
            if restart_interval and n_done and n_done % restart_interval == 0:
                br.restart()
                pred = 0
            n_done += 1
            s = _decode_sym(br, dctab)
            diff = _extend(br.bits(s), s)
            pred += diff
            zz = [0] * 64
            zz[0] = pred
            k = 1
            while k < 64:
                sym = _decode_sym(br, actab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = [[0.0] * 8 for _ in range(8)]
            for idx in range(64):
                nat = ZIGZAG[idx]
                coef[nat // 8][nat % 8] = zz[idx] * q[nat]
            pix = _idct(coef)
            for y in range(8):
                row = out[byi * 8 + y]
                for x in range(8):
                    v = int(round(pix[y][x])) + 128
                    row[bxi * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return [row[:width] for row in out[:height]]


def jpeg_gray_features(data: bytes, size: int = 8):
    """Decode a baseline grayscale JPEG and box-average its pixels
    into ``size`` horizontal buckets normalized to [0, 1] — identical
    pooling to :func:`functions.png.png_gray_features`."""
    rows = decode_jpeg_gray(data)
    width = len(rows[0])
    if width < size:
        raise ValueError(f"image width {width} < feature size {size}")
    feats = []
    for i in range(size):
        lo = i * width // size
        hi = (i + 1) * width // size
        total = sum(sum(row[lo:hi]) for row in rows)
        feats.append(total / ((hi - lo) * len(rows)) / 255.0)
    return feats


# --- progressive (SOF2) support ---------------------------------------------
#
# Progressive JPEG (T.81 Annex G, Huffman flavor) splits the quantized
# DCT coefficients across multiple scans: spectral selection (Ss..Se
# band per scan) and successive approximation (coarse bits first —
# Ah/Al point transform — then one refinement bit per scan).  The
# encoder below emits the minimal legal 4-scan schedule that exercises
# every decoder path (DC first + DC refine + AC first + AC refine);
# the decoder handles general single-component progressive streams,
# including EOBn run symbols with extra bits that the encoder itself
# never emits.


def _quantized_blocks(pixels, q):
    """FDCT + quantize every 8×8 block (edge-replicated padding);
    returns (height, width, bh, bw, blocks) with each block a 64-entry
    NATURAL-order coefficient list."""
    if not pixels or not pixels[0]:
        raise ValueError("empty pixel grid")
    height = len(pixels)
    width = len(pixels[0])
    if any(len(row) != width for row in pixels):
        raise ValueError("ragged pixel grid")
    h8 = (height + 7) // 8 * 8
    w8 = (width + 7) // 8 * 8
    grid = [
        [pixels[min(y, height - 1)][min(x, width - 1)] for x in range(w8)]
        for y in range(h8)
    ]
    blocks = []
    for by in range(0, h8, 8):
        for bx in range(0, w8, 8):
            block = [
                [grid[by + y][bx + x] - 128 for x in range(8)]
                for y in range(8)
            ]
            coef = _fdct(block)
            nat = [0] * 64
            for v in range(64):
                nat[v] = int(round(coef[v // 8][v % 8] / q[v]))
            blocks.append(nat)
    return height, width, h8 // 8, w8 // 8, blocks


def _sos_progressive(ss: int, se: int, ah: int, al: int) -> bytes:
    return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
        [1, 0x00, ss, se, (ah << 4) | al]
    )


def encode_jpeg_gray_progressive(pixels, quant=None) -> bytes:
    """Encode a row-major 0-255 grid as a PROGRESSIVE (SOF2) 8-bit
    grayscale JPEG with a 4-scan schedule:

    1. DC first       (Ss=0 Se=0  Ah=0 Al=1) — Huffman diffs of dc>>1
    2. DC refinement  (Ss=0 Se=0  Ah=1 Al=0) — one raw bit per block
    3. AC first       (Ss=1 Se=63 Ah=0 Al=1) — magnitudes ÷2, per-
       block EOB (the encoder never accumulates cross-block EOB runs;
       run-of-1 EOBs are legal and keep correction-bit flushing local)
    4. AC refinement  (Ss=1 Se=63 Ah=1 Al=0) — newly-significant
       coefficients as (run<<4)|1 + sign, correction bits for
       previously-significant ones (T.81 G.1.2.3)

    Two approximation levels reconstruct every coefficient exactly
    (|c| = 2·(|c|÷2) + (|c|&1)), so the progressive stream decodes to
    the IDENTICAL pixels as :func:`encode_jpeg_gray` of the same input
    — which is what makes a lossy-format oracle query possible.
    """
    q = list(quant) if quant is not None else list(DEFAULT_QUANT)
    if len(q) != 64 or any(not (1 <= x <= 255) for x in q):
        raise ValueError("quant table must be 64 entries in 1..255")
    height, width, bh, bw_, blocks = _quantized_blocks(pixels, q)

    # scan 1: DC first, Al=1 (arithmetic shift — floor — per spec)
    w1 = _BitWriter()
    pred = 0
    for nat in blocks:
        v = nat[0] >> 1
        diff = v - pred
        pred = v
        cat = _bitlen(abs(diff))
        if cat > 11:
            raise ValueError("DC difference out of category range")
        length, code = _DC_CODES[cat]
        w1.write(code, length)
        if cat:
            mag = diff if diff > 0 else diff + (1 << cat) - 1
            w1.write(mag, cat)
    w1.flush()

    # scan 2: DC refinement — the Al bit of each DC, raw
    w2 = _BitWriter()
    for nat in blocks:
        w2.write(nat[0] & 1, 1)
    w2.flush()

    # scan 3: AC first, Al=1 — code t = c/2 truncated toward zero
    w3 = _BitWriter()
    for nat in blocks:
        run = 0
        for k in range(1, 64):
            c = nat[ZIGZAG[k]]
            t = -((-c) >> 1) if c < 0 else c >> 1
            if t == 0:
                run += 1
                continue
            while run > 15:
                length, code = _AC_CODES[0xF0]
                w3.write(code, length)
                run -= 16
            size = _bitlen(abs(t))
            if size > 10:
                raise ValueError(
                    "AC coefficient too large for the 10-bit "
                    "category limit; use a coarser quant table"
                )
            length, code = _AC_CODES[(run << 4) | size]
            w3.write(code, length)
            mag = t if t > 0 else t + (1 << size) - 1
            w3.write(mag, size)
            run = 0
        if run:
            length, code = _AC_CODES[0x00]  # EOB (run of 1)
            w3.write(code, length)
    w3.flush()

    # scan 4: AC refinement (Ah=1, Al=0), per-block EOB flushing.
    # The ZRL check runs at EVERY nonzero-history position, BEFORE a
    # correction bit is buffered (libjpeg's invariant): that keeps the
    # run ≤ 15 whenever a bit is buffered, so every buffered bit lies
    # within the advance span of the symbol that flushes it — exactly
    # what the decoder's interleaved bit-reads assume.  Runs past the
    # LAST newly-significant coefficient fold into the EOB instead of
    # ZRLs (the k ≤ eob guard).
    w4 = _BitWriter()
    for nat in blocks:
        eob = 0
        for k in range(1, 64):
            if abs(nat[ZIGZAG[k]]) == 1:
                eob = k
        run = 0
        pend: list[int] = []
        for k in range(1, 64):
            c = nat[ZIGZAG[k]]
            a = abs(c)
            if a == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                length, code = _AC_CODES[0xF0]
                w4.write(code, length)
                run -= 16
                for b in pend:
                    w4.write(b, 1)
                pend = []
            if a > 1:  # previously significant → correction bit
                pend.append(a & 1)
                continue
            # newly significant (|c| == 1)
            length, code = _AC_CODES[(run << 4) | 1]
            w4.write(code, length)
            w4.write(1 if c > 0 else 0, 1)
            for b in pend:
                w4.write(b, 1)
            pend = []
            run = 0
        if run or pend:
            length, code = _AC_CODES[0x00]  # EOB (run of 1)
            w4.write(code, length)
            for b in pend:
                w4.write(b, 1)
    w4.flush()

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        q[ZIGZAG[k]] for k in range(64)
    )
    sof2 = b"\xff\xc2" + struct.pack(
        ">HBHHB", 11, 8, height, width, 1
    ) + bytes([1, 0x11, 0])
    return (
        SOI
        + dqt
        + sof2
        + _dht_segment(0, 0, _DC_SYMBOLS, 4)
        + _dht_segment(1, 0, _AC_SYMBOLS, 8)
        + _sos_progressive(0, 0, 0, 1)
        + bytes(w1.buf)
        + _sos_progressive(0, 0, 1, 0)
        + bytes(w2.buf)
        + _sos_progressive(1, 63, 0, 1)
        + bytes(w3.buf)
        + _sos_progressive(1, 63, 1, 0)
        + bytes(w4.buf)
        + b"\xff\xd9"
    )


def _refine_nonzero(br: _BitReader, coefs, zz_from: int, zz_to: int, al: int):
    """Read one correction bit for every already-nonzero coefficient
    in zigzag positions [zz_from, zz_to] and apply it toward the
    coefficient's sign (G.1.2.3 refinement rule)."""
    p1 = 1 << al
    for k in range(zz_from, zz_to + 1):
        nat = ZIGZAG[k]
        cur = coefs[nat]
        if cur == 0:
            continue
        if br.bit() and (abs(cur) >> al) & 1 == 0:
            coefs[nat] = cur + p1 if cur > 0 else cur - p1


def decode_jpeg_gray_progressive(data: bytes):
    """Decode a PROGRESSIVE (SOF2) single-component 8-bit grayscale
    JPEG to a row-major grid of 0-255 ints: multi-scan spectral
    selection + successive approximation, DC refinement bits, AC EOBn
    run symbols (with extra bits), ZRL and correction bits in
    refinement scans, byte unstuffing, arbitrary stream-read DQT/DHT.
    Raises ``ValueError`` outside that subset (color, restart
    intervals, 16-bit quant tables, arithmetic coding, truncation)."""
    if not data.startswith(SOI):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant = {}
    huff = {}
    dims = None
    sof_tq = None
    coefs = None  # per block: 64 natural-order ints
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (8- or 16-bit precision)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                w = 2 if pq else 1
                if i + 1 + 64 * w > len(body):
                    raise ValueError("truncated DQT")
                tbl = [0] * 64
                for k in range(64):
                    if pq:
                        tbl[ZIGZAG[k]] = (
                            body[i + 1 + 2 * k] << 8
                        ) | body[i + 2 + 2 * k]
                    else:
                        tbl[ZIGZAG[k]] = body[i + 1 + k]
                quant[tq] = tbl
                i += 1 + 64 * w
        elif marker == 0xC4:  # DHT (tables may arrive between scans)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                symbols = list(body[i + 17:i + 17 + n])
                if len(symbols) != n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _build_huff(counts, symbols)
                i += 17 + n
        elif marker == 0xC2:  # SOF2 progressive
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale)")
            hv, tq = body[7], body[8]
            if hv != 0x11:
                raise ValueError("only 1x1 sampling supported")
            dims = (height, width)
            sof_tq = tq
            bh = (height + 7) // 8
            bw_ = (width + 7) // 8
            coefs = [[0] * 64 for _ in range(bh * bw_)]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive (SOF2) frame")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — one scan
            if coefs is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans")
            tdta = body[2]
            ss, se, ahal = body[3], body[4], body[5]
            ah, al = ahal >> 4, ahal & 0xF
            br = _BitReader(data, pos + seglen)
            _decode_progressive_scan(
                br, coefs, huff, ss, se, ah, al, tdta >> 4, tdta & 0xF,
                restart_interval,
            )
            # resync: skip residual entropy bytes up to the next marker
            p = br.pos
            while p + 1 < len(data) and not (
                data[p] == 0xFF and data[p + 1] != 0x00
            ):
                p += 1
            pos = p
            continue
        pos += seglen
    if dims is None or coefs is None:
        raise ValueError("missing SOF2 or SOS")
    if sof_tq not in quant:
        raise ValueError("missing quantization table")
    q = quant[sof_tq]
    height, width = dims
    bh = (height + 7) // 8
    bw_ = (width + 7) // 8
    out = [[0] * (bw_ * 8) for _ in range(bh * 8)]
    for bi, nat in enumerate(coefs):
        byi, bxi = divmod(bi, bw_)
        coef = [[0.0] * 8 for _ in range(8)]
        for v in range(64):
            coef[v // 8][v % 8] = nat[v] * q[v]
        pix = _idct(coef)
        for y in range(8):
            row = out[byi * 8 + y]
            for x in range(8):
                val = int(round(pix[y][x])) + 128
                row[bxi * 8 + x] = (
                    0 if val < 0 else (255 if val > 255 else val)
                )
    return [row[:width] for row in out[:height]]


def _decode_progressive_scan(
    br, coefs, huff, ss, se, ah, al, dc_id, ac_id, ri=0
):
    """Decode one progressive scan in place over every block.  ``ri``
    is the DRI restart interval: every ``ri`` blocks the entropy
    stream byte-aligns to an RSTn marker and DC prediction / EOB runs
    reset."""

    def _restart_due(idx: int) -> bool:
        return bool(ri) and idx > 0 and idx % ri == 0

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        if ah == 0:  # DC first
            tab = huff.get((0, dc_id))
            if tab is None:
                raise ValueError("missing huffman table")
            pred = 0
            for bi, nat in enumerate(coefs):
                if _restart_due(bi):
                    br.restart()
                    pred = 0
                s = _decode_sym(br, tab)
                pred += _extend(br.bits(s), s)
                nat[0] = pred << al
        else:  # DC refinement: one raw bit per block
            for bi, nat in enumerate(coefs):
                if _restart_due(bi):
                    br.restart()
                if br.bit():
                    nat[0] |= 1 << al
        return
    # AC scan
    tab = huff.get((1, ac_id))
    if tab is None:
        raise ValueError("missing huffman table")
    eobrun = 0
    if ah == 0:  # AC first (spectral selection at approximation al)
        for bi, nat in enumerate(coefs):
            if _restart_due(bi):
                br.restart()
                eobrun = 0
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _decode_sym(br, tab)
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                nat[ZIGZAG[k]] = _extend(br.bits(s), s) << al
                k += 1
    else:  # AC refinement
        p1, m1 = 1 << al, -(1 << al)
        for bi, nat in enumerate(coefs):
            if _restart_due(bi):
                br.restart()
                eobrun = 0
            if eobrun > 0:
                eobrun -= 1
                _refine_nonzero(br, nat, ss, se, al)
                continue
            k = ss
            while k <= se:
                sym = _decode_sym(br, tab)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + (br.bits(r) if r else 0)
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "refinement scan size must be 1"
                        )
                    newval = p1 if br.bit() else m1
                while k <= se:
                    nat_k = ZIGZAG[k]
                    cur = nat[nat_k]
                    if cur != 0:
                        if br.bit() and (abs(cur) >> al) & 1 == 0:
                            nat[nat_k] = (
                                cur + p1 if cur > 0 else cur + m1
                            )
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    nat[ZIGZAG[k]] = newval
                k += 1
            if eobrun > 0:
                # EOBn covers THIS block too: refine its remainder
                _refine_nonzero(br, nat, k, se, al)
                eobrun -= 1


def decode_jpeg_gray_any(data: bytes):
    """Decode ANY supported JPEG flavor to a grayscale pixel grid,
    dispatching on the frame marker and component count found in the
    stream: baseline single-component (SOF0/ncomp=1), progressive
    (SOF2), or interleaved baseline COLOR (SOF0/ncomp=3 — returns the
    full-resolution luma plane)."""
    if not data.startswith(SOI):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 3 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xC0:
            ncomp = data[pos + 4 + 5] if pos + 9 < len(data) else 1
            if ncomp == 3:
                return decode_jpeg_color_luma(data)
            return decode_jpeg_gray(data)
        if marker == 0xC2:
            return decode_jpeg_gray_progressive(data)
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        pos += 2 + seglen
    raise ValueError("no SOF0/SOF2 frame found")


def jpeg_gray_features_any(data: bytes, size: int = 8):
    """Pooled features over baseline OR progressive grayscale JPEG —
    identical pooling to :func:`jpeg_gray_features`."""
    rows = decode_jpeg_gray_any(data)
    width = len(rows[0])
    if width < size:
        raise ValueError(f"image width {width} < feature size {size}")
    feats = []
    for i in range(size):
        lo = i * width // size
        hi = (i + 1) * width // size
        total = sum(sum(row[lo:hi]) for row in rows)
        feats.append(total / ((hi - lo) * len(rows)) / 255.0)
    return feats


# --- color (multi-component) baseline support -------------------------------
#
# Real-world JPEGs are overwhelmingly 3-component YCbCr (4:2:0 or
# 4:4:4).  The decoder below handles the general interleaved baseline
# MCU layout (arbitrary Hi/Vi sampling factors, per-component
# quant/Huffman tables, restart intervals) and returns the LUMA plane
# — "decode to grayscale" for the feature pipeline, chroma entropy-
# decoded to keep the stream in sync.  The encoder emits 4:4:4 or
# 4:2:0 fixtures so the MCU path is round-trip-proven in-container.


def encode_jpeg_color(y, cb, cr, sampling="4:2:0", quant=None) -> bytes:
    """Encode YCbCr planes as an interleaved baseline color JPEG.
    ``y`` is H×W; ``cb``/``cr`` are H×W for 4:4:4 or (H/2)×(W/2) for
    4:2:0 (H, W multiples of 16 for 4:2:0).  One quant table and one
    canonical Huffman table pair shared by all components."""
    if sampling == "4:4:4":
        factors = [(1, 1), (1, 1), (1, 1)]
    elif sampling == "4:2:0":
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError("sampling must be '4:4:4' or '4:2:0'")
    q = list(quant) if quant is not None else list(DEFAULT_QUANT)
    if len(q) != 64 or any(not (1 <= x <= 255) for x in q):
        raise ValueError("quant table must be 64 entries in 1..255")
    planes = [y, cb, cr]
    height, width = len(y), len(y[0])
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    if height % (8 * vmax) or width % (8 * hmax):
        raise ValueError(
            "plane dims must be multiples of the MCU size"
        )
    for (h, v), p in zip(factors, planes):
        if len(p) != height * v // vmax or len(p[0]) != width * h // hmax:
            raise ValueError("chroma plane dims do not match sampling")
    mcu_rows = height // (8 * vmax)
    mcu_cols = width // (8 * hmax)
    bw = _BitWriter()
    preds = [0, 0, 0]

    def emit_block(plane, by, bx, ci):
        block = [
            [plane[by * 8 + yy][bx * 8 + xx] - 128 for xx in range(8)]
            for yy in range(8)
        ]
        coef = _fdct(block)
        zz = []
        for k in range(64):
            nat = ZIGZAG[k]
            zz.append(int(round(coef[nat // 8][nat % 8] / q[nat])))
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        cat = _bitlen(abs(diff))
        if cat > 11:
            raise ValueError("DC difference out of category range")
        length, code = _DC_CODES[cat]
        bw.write(code, length)
        if cat:
            mag = diff if diff > 0 else diff + (1 << cat) - 1
            bw.write(mag, cat)
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = _AC_CODES[0xF0]
                bw.write(code, length)
                run -= 16
            size = _bitlen(abs(v))
            if size > 10:
                raise ValueError("AC coefficient category > 10")
            length, code = _AC_CODES[(run << 4) | size]
            bw.write(code, length)
            mag = v if v > 0 else v + (1 << size) - 1
            bw.write(mag, size)
            run = 0
        if run:
            length, code = _AC_CODES[0x00]
            bw.write(code, length)

    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, ((h, v), plane) in enumerate(zip(factors, planes)):
                for vy in range(v):
                    for hx in range(h):
                        emit_block(plane, my * v + vy, mx * h + hx, ci)
    bw.flush()

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        q[ZIGZAG[k]] for k in range(64)
    )
    comps = b"".join(
        bytes([i + 1, (h << 4) | v, 0])
        for i, (h, v) in enumerate(factors)
    )
    sof0 = b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * 3, 8, height, width, 3
    ) + comps
    sos = (
        b"\xff\xda"
        + struct.pack(">HB", 6 + 2 * 3, 3)
        + b"".join(bytes([i + 1, 0x00]) for i in range(3))
        + bytes([0, 63, 0])
    )
    return (
        SOI
        + dqt
        + sof0
        + _dht_segment(0, 0, _DC_SYMBOLS, 4)
        + _dht_segment(1, 0, _AC_SYMBOLS, 8)
        + sos
        + bytes(bw.buf)
        + b"\xff\xd9"
    )


def decode_jpeg_color_luma(data: bytes):
    """Decode an interleaved baseline COLOR (3-component YCbCr) JPEG
    and return the full-resolution LUMA plane as 0-255 ints — the
    "decode to grayscale" path for feature extraction.  Arbitrary
    Hi/Vi sampling factors (4:4:4, 4:2:0, 4:2:2, …), per-component
    quant/Huffman tables, 8/16-bit DQT, restart intervals.  Chroma
    blocks are fully entropy-decoded (the stream cannot be skipped),
    their pixels discarded.  Single-component streams raise — use
    :func:`decode_jpeg_gray`; non-interleaved multi-scan color
    raises."""
    if not data.startswith(SOI):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant = {}
    huff = {}
    dims = None
    comps = None  # list of (comp_id, h, v, tq)
    restart_interval = 0
    scan = None
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                w = 2 if pq else 1
                tbl = [0] * 64
                for k in range(64):
                    if pq:
                        tbl[ZIGZAG[k]] = (
                            body[i + 1 + 2 * k] << 8
                        ) | body[i + 2 + 2 * k]
                    else:
                        tbl[ZIGZAG[k]] = body[i + 1 + k]
                quant[tq] = tbl
                i += 1 + 64 * w
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                huff[(tc, th)] = _build_huff(
                    counts, list(body[i + 17:i + 17 + n])
                )
                i += 17 + n
        elif marker == 0xC0:
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 3:
                raise ValueError(
                    "decode_jpeg_color_luma needs a 3-component frame"
                )
            dims = (height, width)
            comps = []
            for c in range(3):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + 3 * c]))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG frame unsupported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            if comps is None:
                raise ValueError("SOS before SOF0")
            if ns != 3:
                raise ValueError(
                    "only interleaved 3-component scans supported"
                )
            tables = {}
            for c in range(ns):
                cid = body[1 + 2 * c]
                t = body[2 + 2 * c]
                tables[cid] = (t >> 4, t & 0xF)
            scan = (tables, pos + seglen)
            break
        pos += seglen
    if dims is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    tables, data_pos = scan
    height, width = dims
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcu_rows = (height + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    luma_id, lh, lv, _ = comps[0]
    luma = [
        [0] * (mcu_cols * lh * 8) for _ in range(mcu_rows * lv * 8)
    ]
    br = _BitReader(data, data_pos)
    preds = {cid: 0 for cid, _, _, _ in comps}
    n_mcu = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.restart()
                preds = {cid: 0 for cid, _, _, _ in comps}
            n_mcu += 1
            for (cid, ch, cv, tq) in comps:
                if tq not in quant:
                    raise ValueError("missing quantization table")
                dc_id, ac_id = tables[cid]
                dctab = huff.get((0, dc_id))
                actab = huff.get((1, ac_id))
                if dctab is None or actab is None:
                    raise ValueError("missing huffman table")
                q = quant[tq]
                for vy in range(cv):
                    for hx in range(ch):
                        s = _decode_sym(br, dctab)
                        preds[cid] += _extend(br.bits(s), s)
                        zz = [0] * 64
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = _decode_sym(br, actab)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC run past end of block"
                                )
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        if cid != luma_id:
                            continue  # chroma: stream consumed, done
                        coef = [[0.0] * 8 for _ in range(8)]
                        for idx in range(64):
                            nat = ZIGZAG[idx]
                            coef[nat // 8][nat % 8] = zz[idx] * q[nat]
                        pix = _idct(coef)
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + hx) * 8
                        for yy in range(8):
                            row = luma[by + yy]
                            for xx in range(8):
                                v = int(round(pix[yy][xx])) + 128
                                row[bx + xx] = (
                                    0 if v < 0
                                    else (255 if v > 255 else v)
                                )
    # luma plane resolution: width * lh / hmax — upsample to full res
    lw = width * lh // hmax
    lhgt = height * lv // vmax
    plane = [row[:lw] for row in luma[:lhgt]]
    if lh == hmax and lv == vmax:
        return plane
    return [
        [plane[yy * lv // vmax][xx * lh // hmax] for xx in range(width)]
        for yy in range(height)
    ]
