"""Vendored baseline-JPEG codec (functions/jpeg.py): lossless
block-constant anchor, bounded lossy roundtrip, subset gates, and the
decode_image_real dispatch."""

from __future__ import annotations

import random

import pytest

from blueforty___etl_data_pipeline_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    jpeg_gray_features,
)


def test_block_constant_roundtrip_is_lossless():
    # A constant 8x8 block has only a DC coefficient 8*(v-128); the
    # flat q=8 default table quantizes it to exactly v-128, so the
    # decode reproduces every pixel bit-for-bit — the determinism
    # anchor the oracle query relies on.
    vals = [17, 250, 0, 128]
    img = [[vals[(y // 8) * 2 + (x // 8)] for x in range(16)] for y in range(16)]
    assert decode_jpeg_gray(encode_jpeg_gray(img)) == img


def test_random_roundtrip_bounded_error_and_stuffing():
    # Arbitrary pixels exercise the full pipeline: AC runs, ZRL, EOB,
    # magnitude categories, and (statistically, over this many blocks)
    # 0xFF byte stuffing.  With a flat quant of 2 the DCT roundtrip
    # error is bounded by a couple of grey levels.
    random.seed(7)
    img = [[random.randrange(256) for _ in range(64)] for _ in range(40)]
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=[2] * 64))
    err = max(
        abs(a - b) for ra, rb in zip(img, out) for a, b in zip(ra, rb)
    )
    assert err <= 3


def test_non_multiple_of_eight_dims_crop():
    img = [[(x * 7 + y * 3) % 256 for x in range(13)] for y in range(11)]
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=[2] * 64))
    assert len(out) == 11 and len(out[0]) == 13


def test_unsupported_subsets_raise():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xc2\x00\x05aaa")  # progressive
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg")
    img = [[0] * 8 for _ in range(8)]
    blob = encode_jpeg_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:40])  # truncated
    # restart intervals are SUPPORTED since round 6: a DRI segment on
    # a single-block image decodes identically (no RSTn ever due)
    dri = b"\xff\xdd\x00\x04\x00\x08"
    assert decode_jpeg_gray(blob[:2] + dri + blob[2:]) == img


def test_features_and_decode_image_real_dispatch():
    from blueforty___etl_data_pipeline_spark.operators.multimodal import (
        decode_image_real,
    )

    vals = [10, 20, 30, 40]
    img = [[vals[(y // 8) * 2 + (x // 8)] for x in range(16)] for y in range(16)]
    blob = encode_jpeg_gray(img)
    exp = [(vals[0] + vals[2]) / 510.0] * 4 + [(vals[1] + vals[3]) / 510.0] * 4
    for feats in (jpeg_gray_features(blob), decode_image_real(blob)):
        assert feats == pytest.approx(exp, abs=1e-12)


def test_progressive_roundtrip_matches_baseline_decode():
    import random

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_any,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = random.Random(1234)
    for _ in range(8):
        h = rng.choice([8, 16, 17, 24])
        w = rng.choice([8, 16, 19, 24])
        img = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        base = decode_jpeg_gray(encode_jpeg_gray(img))
        prog = decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(img)
        )
        assert prog == base
        assert decode_jpeg_gray_any(encode_jpeg_gray_progressive(img)) == base
        assert decode_jpeg_gray_any(encode_jpeg_gray(img)) == base


def test_progressive_block_constant_lossless():
    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray_progressive,
        encode_jpeg_gray_progressive,
    )

    for vals in [(0, 255, 128, 7), (200, 3, 99, 250)]:
        img = [
            [vals[(y // 8) * 2 + (x // 8)] for x in range(16)]
            for y in range(16)
        ]
        assert decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(img)
        ) == img


def test_progressive_sparse_exercises_zrl_and_eob_runs():
    import random

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = random.Random(7)
    for _ in range(10):
        img = [[128] * 40 for _ in range(16)]
        for _ in range(6):
            img[rng.randrange(16)][rng.randrange(40)] = rng.choice(
                [0, 255]
            )
        assert decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(img)
        ) == decode_jpeg_gray(encode_jpeg_gray(img))


def test_progressive_decoder_rejects_baseline_and_vice_versa():
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    img = [[128] * 8 for _ in range(8)]
    with _pytest.raises(ValueError):
        decode_jpeg_gray_progressive(encode_jpeg_gray(img))
    with _pytest.raises(ValueError):
        decode_jpeg_gray(encode_jpeg_gray_progressive(img))


def test_decode_any_handles_foreign_eobn_runs():
    """A hand-built progressive stream using an EOBn symbol with extra
    bits (run of 3 all-zero-AC blocks) — the symbol our encoder never
    emits but foreign encoders (libjpeg) do."""
    import struct

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        SOI,
        ZIGZAG,
        _BitWriter,
        _dht_segment,
        decode_jpeg_gray_progressive,
    )

    q = [8] * 64
    # 32x8 image: 4 blocks, constant 136 -> dc = 1 per block, no AC
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        q[ZIGZAG[k]] for k in range(64)
    )
    sof2 = b"\xff\xc2" + struct.pack(
        ">HBHHB", 11, 8, 8, 32, 1
    ) + bytes([1, 0x11, 0])
    dc_syms = tuple(range(12))
    ac_syms = (0x00, 0xF0, 0x11, 0x21) + (0x10,)  # includes EOB1
    dht = _dht_segment(0, 0, dc_syms, 4) + _dht_segment(1, 0, ac_syms, 8)

    def sos(ss, se, ah, al):
        return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, ss, se, (ah << 4) | al]
        )

    # DC scan (Ah=0, Al=0): constant 136 -> dc = 8*(136-128)/q0 = 8,
    # so diffs are 8,0,0,0 -> cat 4 (mag 8), then three cat-0s
    w = _BitWriter()
    w.write(4, 4)  # cat 4
    w.write(8, 4)  # mag bits 1000 -> +8
    for _ in range(3):
        w.write(0, 4)  # cat 0
    w.flush()
    dc_scan = sos(0, 0, 0, 0) + bytes(w.buf)
    # AC scan (Ss=1..63, Ah=0, Al=0): EOB1 symbol covers 2 blocks +
    # 1 extra bit -> run of 2+1 = 3? EOB1 = (1<<1)+bits(1): set bit=1
    # -> 3 blocks; then one more EOB0 for the last block
    w = _BitWriter()
    w.write(4, 8)  # ac_syms index 4 = 0x10 (EOB1)
    w.write(1, 1)  # extra bit -> run covers 3 blocks
    w.write(0, 8)  # EOB0 for 4th block
    w.flush()
    ac_scan = sos(1, 63, 0, 0) + bytes(w.buf)
    data = SOI + dqt + sof2 + dht + dc_scan + ac_scan + b"\xff\xd9"
    rows = decode_jpeg_gray_progressive(data)
    assert len(rows) == 8 and len(rows[0]) == 32
    assert all(v == 136 for row in rows for v in row)


def test_restart_intervals_roundtrip_baseline():
    import random

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = random.Random(9)
    img = [[rng.randrange(256) for _ in range(40)] for _ in range(24)]
    want = decode_jpeg_gray(encode_jpeg_gray(img))
    for ri in (1, 2, 3, 7):
        got = decode_jpeg_gray(
            encode_jpeg_gray(img, restart_interval=ri)
        )
        assert got == want


def test_16bit_quant_table_decode():
    """Rewrite the 8-bit DQT of an encoded stream as pq=1 (16-bit
    entries) — decode must be identical."""
    import random
    import struct

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = random.Random(10)
    img = [[rng.randrange(256) for _ in range(16)] for _ in range(16)]
    data = encode_jpeg_gray(img)
    i = data.index(b"\xff\xdb")
    seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
    body = data[i + 4 : i + 2 + seglen]
    q8 = body[1:65]
    nb = bytes([0x10 | (body[0] & 0xF)]) + b"".join(
        struct.pack(">H", v) for v in q8
    )
    data16 = (
        data[:i]
        + b"\xff\xdb"
        + struct.pack(">H", len(nb) + 2)
        + nb
        + data[i + 2 + seglen :]
    )
    assert decode_jpeg_gray(data16) == decode_jpeg_gray(data)


def test_progressive_restart_interval_dc_scan():
    """Hand-built progressive stream with DRI=2: the DC-first scan
    carries an RST0 marker after two blocks and the predictor resets
    across it."""
    import struct

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        SOI,
        ZIGZAG,
        _BitWriter,
        _dht_segment,
        decode_jpeg_gray_progressive,
    )

    q = [8] * 64
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        q[ZIGZAG[k]] for k in range(64)
    )
    sof2 = b"\xff\xc2" + struct.pack(
        ">HBHHB", 11, 8, 8, 32, 1
    ) + bytes([1, 0x11, 0])
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    dht = _dht_segment(0, 0, tuple(range(12)), 4) + _dht_segment(
        1, 0, (0x00, 0xF0), 8
    )

    def sos(ss, se, ah, al):
        return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, ss, se, (ah << 4) | al]
        )

    # 4 blocks constant 136 -> dc 8 each.  With DRI=2 the predictor
    # resets after block 2, so diffs are 8,0 | RST0 | 8,0
    w = _BitWriter()
    w.write(4, 4)
    w.write(8, 4)
    w.write(0, 4)
    w.flush()
    dc1 = bytes(w.buf)
    w = _BitWriter()
    w.write(4, 4)
    w.write(8, 4)
    w.write(0, 4)
    w.flush()
    dc2 = bytes(w.buf)
    dc_scan = sos(0, 0, 0, 0) + dc1 + b"\xff\xd0" + dc2
    # AC scan: all-zero AC -> EOB per block, with RST0 after 2 blocks
    w = _BitWriter()
    w.write(0, 8)
    w.write(0, 8)
    w.flush()
    ac1 = bytes(w.buf)
    w = _BitWriter()
    w.write(0, 8)
    w.write(0, 8)
    w.flush()
    ac2 = bytes(w.buf)
    ac_scan = sos(1, 63, 0, 0) + ac1 + b"\xff\xd0" + ac2
    data = (
        SOI + dqt + sof2 + dri + dht + dc_scan + ac_scan + b"\xff\xd9"
    )
    rows = decode_jpeg_gray_progressive(data)
    assert all(v == 136 for row in rows for v in row)


def test_color_jpeg_luma_matches_gray_444_and_420():
    import random

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_color_luma,
        decode_jpeg_gray,
        decode_jpeg_gray_any,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = random.Random(21)
    y = [[rng.randrange(256) for _ in range(16)] for _ in range(16)]
    flat16 = [[128] * 16 for _ in range(16)]
    gray = decode_jpeg_gray(encode_jpeg_gray(y))
    c444 = encode_jpeg_color(y, flat16, flat16, sampling="4:4:4")
    assert decode_jpeg_color_luma(c444) == gray
    y2 = [[rng.randrange(256) for _ in range(32)] for _ in range(16)]
    cb = [[100] * 16 for _ in range(8)]
    cr = [[150] * 16 for _ in range(8)]
    c420 = encode_jpeg_color(y2, cb, cr, sampling="4:2:0")
    want = decode_jpeg_gray(encode_jpeg_gray(y2))
    assert decode_jpeg_color_luma(c420) == want
    # the any-dispatch routes 3-component SOF0 to the color path
    assert decode_jpeg_gray_any(c420) == want


def test_color_jpeg_block_constant_lossless():
    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_color_luma,
        encode_jpeg_color,
    )

    vals = (7, 200, 99, 255)
    y = [
        [vals[(yy // 8) * 2 + (xx // 8)] for xx in range(16)]
        for yy in range(16)
    ]
    flat = [[128] * 8 for _ in range(8)]
    c = encode_jpeg_color(y, flat, flat, sampling="4:2:0")
    assert decode_jpeg_color_luma(c) == y


def test_color_jpeg_rejects_gray_stream():
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_color_luma,
        encode_jpeg_gray,
    )

    with _pytest.raises(ValueError):
        decode_jpeg_color_luma(
            encode_jpeg_gray([[0] * 8 for _ in range(8)])
        )


def test_property_progressive_equals_baseline():
    """Hypothesis: for ANY pixel grid, the progressive stream decodes
    to exactly the baseline decode of the same input (the 2-level
    successive approximation reconstructs every coefficient)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(0, 255), min_size=9, max_size=9),
            min_size=10,
            max_size=10,
        )
    )
    def check(img):
        assert decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(img)
        ) == decode_jpeg_gray(encode_jpeg_gray(img))

    check()


def test_property_restart_interval_invariant():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blueforty___etl_data_pipeline_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(0, 255), min_size=17, max_size=17),
            min_size=17,
            max_size=17,
        ),
        st.integers(1, 9),
    )
    def check(img, ri):
        assert decode_jpeg_gray(
            encode_jpeg_gray(img, restart_interval=ri)
        ) == decode_jpeg_gray(encode_jpeg_gray(img))

    check()
