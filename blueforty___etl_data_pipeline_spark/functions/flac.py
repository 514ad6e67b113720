"""Vendored pure-stdlib FLAC codec (mono, 16-bit) for the COMPRESSED
audio decode path — the lossless-compression sibling of the WAV reader
in :mod:`operators.multimodal`.

The container this engine is developed in has no audio libraries, so
"decode compressed audio" would stay a PIL/ffmpeg-style gate forever.
FLAC is an open public spec (xiph.org / RFC 9639): frames of
Rice-coded prediction residuals — all implementable with nothing
beyond the standard library, and LOSSLESS, so decoded samples are
engine-exact integers (which is what makes an oracle-checkable fixture
query possible, unlike lossy formats).

Subset implemented — exactly what the pipeline needs:

- :func:`encode_flac_mono16` — STREAMINFO + fixed-blocksize frames
  using CONSTANT subframes (constant blocks) or FIXED order-2
  prediction with Rice-coded residuals, correct CRC-8/CRC-16.  Used
  to build deterministic in-repo fixtures (real compression: a
  constant tone compresses ~50×).
- :func:`decode_flac_mono16` — frames from *other* encoders too:
  CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (any order)
  subframes, RICE and RICE2 residual methods with partition orders
  and escape codes, wasted bits, UTF-8-coded frame numbers, all
  blocksize/samplerate header codes.  Stereo, non-16-bit depths, and
  variable blocking raise ``ValueError`` — honest gates.
"""

from __future__ import annotations

import struct

FLAC_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        for shift in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> shift) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self._n:
            self.write(0, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # BIT position
    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated FLAC stream")
        v = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_number(w: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        w.write(n, 8)
        return
    # bits available: 2 bytes->11, 3->16, 4->21, 5->26, 6->31, 7->36
    for nbytes, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << cap):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            w.write(lead | (n >> (6 * (nbytes - 1))), 8)
            for i in range(nbytes - 2, -1, -1):
                w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (((-r) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _write_rice(w: _BitWriter, residuals, param: int) -> None:
    for r in residuals:
        u = _zigzag(r)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _best_rice_param(residuals) -> int:
    best, best_bits = 0, None
    for p in range(15):
        bits = sum((_zigzag(r) >> p) + 1 + p for r in residuals)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def encode_flac_mono16(
    samples, sample_rate: int = 8000, block_size: int = 4096
) -> bytes:
    """Encode int16 mono samples as a real FLAC stream: STREAMINFO +
    fixed-blocksize frames, each frame a CONSTANT subframe (when the
    block is constant) or FIXED order-2 prediction with one Rice
    partition (partition order 0, best 4-bit parameter)."""
    samples = list(samples)
    if any(not (-32768 <= s <= 32767) for s in samples):
        raise ValueError("samples must be int16")
    if not samples:
        raise ValueError("empty sample stream")
    n_total = len(samples)
    # STREAMINFO (34 bytes): md5 left zero = "unknown", legal per spec
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)   # channels - 1
    si.write(15, 5)  # bits per sample - 1
    si.write(n_total, 36)
    streaminfo = bytes(si.buf) + b"\x00" * 16
    out = bytearray()
    out += FLAC_MAGIC
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    for fi, start in enumerate(range(0, n_total, block_size)):
        block = samples[start : start + block_size]
        bs = len(block)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)   # reserved
        w.write(0, 1)   # fixed blocksize
        w.write(0b0111, 4)   # blocksize: 16-bit field at header end
        w.write(0, 4)   # sample rate: from STREAMINFO
        w.write(0, 4)   # channels: mono
        w.write(0b100, 3)  # 16 bits per sample
        w.write(0, 1)   # reserved
        _utf8_number(w, fi)
        w.write(bs - 1, 16)
        w.align()
        header = bytes(w.buf)
        w.write(_crc8(header), 8)

        if all(s == block[0] for s in block):
            w.write(0, 1)
            w.write(0b000000, 6)  # CONSTANT
            w.write(0, 1)  # no wasted bits
            w.write(block[0], 16)
        elif bs <= 2:
            w.write(0, 1)
            w.write(0b000001, 6)  # VERBATIM
            w.write(0, 1)
            for s in block:
                w.write(s, 16)
        else:
            order = 2
            w.write(0, 1)
            w.write(0b001000 | order, 6)  # FIXED order 2
            w.write(0, 1)
            for s in block[:order]:
                w.write(s, 16)
            residuals = [
                block[i] - (2 * block[i - 1] - block[i - 2])
                for i in range(order, bs)
            ]
            p = _best_rice_param(residuals)
            w.write(0, 2)  # residual method: RICE (4-bit params)
            w.write(0, 4)  # partition order 0
            w.write(p, 4)
            _write_rice(w, residuals, p)
        w.align()
        frame = bytes(w.buf)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_residual(br: _BitReader, bs: int, order: int):
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("blocksize not divisible by partitions")
    residuals = []
    for part in range(nparts):
        n = bs // nparts - (order if part == 0 else 0)
        param = br.bits(pbits)
        if param == escape:
            raw = br.bits(5)
            for _ in range(n):
                residuals.append(br.sbits(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << param) | (br.bits(param) if param else 0)
                residuals.append(_unzigzag(u))
    return residuals


def decode_flac_mono16(data: bytes):
    """Decode a mono 16-bit FLAC stream to (samples, sample_rate) —
    samples a list of exact ints.  Handles CONSTANT / VERBATIM /
    FIXED / LPC subframes, RICE + RICE2 partitioned residuals with
    escape codes, wasted bits, and both blocksize/samplerate header
    encodings; raises ``ValueError`` outside the mono/16-bit subset."""
    if not data.startswith(FLAC_MAGIC):
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    sr = None
    n_total = None
    # metadata blocks
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            br = _BitReader(body)
            br.bits(16)
            br.bits(16)
            br.bits(24)
            br.bits(24)
            sr = br.bits(20)
            nch = br.bits(3) + 1
            bps = br.bits(5) + 1
            n_total = br.bits(36)
            if nch != 1:
                raise ValueError("only mono FLAC supported")
            if bps != 16:
                raise ValueError("only 16-bit FLAC supported")
        pos += 4 + length
        if hdr & 0x80:
            break
    if sr is None:
        raise ValueError("missing STREAMINFO")
    samples: list[int] = []
    br = _BitReader(data, pos * 8)
    while (br.pos >> 3) < len(data) and (
        n_total is None or n_total == 0 or len(samples) < n_total
    ):
        if br.bits(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        br.bit()  # reserved
        if br.bit() != 0:
            raise ValueError("variable blocksize streams unsupported")
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        bps_code = br.bits(3)
        br.bit()  # reserved
        if ch_code != 0:
            raise ValueError("only mono FLAC supported")
        if bps_code not in (0, 0b100):
            raise ValueError("only 16-bit FLAC supported")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            bs = br.bits(8) + 1
        elif bs_code == 7:
            bs = br.bits(16) + 1
        else:
            bs = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        br.bits(8)  # header CRC-8 (not re-verified)
        # one subframe (mono)
        if br.bit() != 0:
            raise ValueError("bad subframe padding bit")
        sft = br.bits(6)
        wasted = 0
        if br.bit():
            wasted = br.unary() + 1
        eff = 16 - wasted
        if sft == 0:  # CONSTANT
            v = br.sbits(eff)
            block = [v] * bs
        elif sft == 1:  # VERBATIM
            block = [br.sbits(eff) for _ in range(bs)]
        elif 8 <= sft <= 12:  # FIXED
            order = sft & 0x7
            block = [br.sbits(eff) for _ in range(order)]
            res = _decode_residual(br, bs, order)
            coefs = _FIXED_COEFS[order]
            for r in res:
                pred = sum(
                    c * block[len(block) - 1 - i]
                    for i, c in enumerate(coefs)
                )
                block.append(r + pred)
        elif sft >= 32:  # LPC
            order = (sft & 0x1F) + 1
            block = [br.sbits(eff) for _ in range(order)]
            prec = br.bits(4) + 1
            if prec == 16:
                raise ValueError("invalid LPC precision code")
            shift = br.sbits(5)
            if shift < 0:
                raise ValueError("negative LPC shift")
            coefs = [br.sbits(prec) for _ in range(order)]
            res = _decode_residual(br, bs, order)
            for r in res:
                acc = sum(
                    c * block[len(block) - 1 - i]
                    for i, c in enumerate(coefs)
                )
                block.append(r + (acc >> shift))
        else:
            raise ValueError(f"reserved subframe type {sft}")
        if wasted:
            block = [s << wasted for s in block]
        br.align()
        br.bits(16)  # frame CRC-16 (not re-verified)
        samples.extend(block)
    if n_total:
        samples = samples[:n_total]
    return samples, sr


def flac_audio_stats(data: bytes):
    """Decode a mono 16-bit FLAC blob and return the same all-integer
    stat row as the WAV path: (n_frames, framerate, peak_abs,
    sum_abs) — engine-exact, oracle-checkable."""
    samples, sr = decode_flac_mono16(data)
    peak = max((abs(s) for s in samples), default=0)
    return len(samples), sr, peak, sum(abs(s) for s in samples)
