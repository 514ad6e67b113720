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
    # restart intervals are an explicit gate, not a silent wrong decode
    dri = b"\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:2] + dri + blob[2:])


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
