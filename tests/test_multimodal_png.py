"""Real PNG decode kernel (VERDICT r03 item 4): stdlib zlib + full
filter reconstruction, golden-pinned on committed fixtures, quarantine
on corruption, honest DecodeUnavailable on unsupported shapes, and the
distributed featurize/resize paths exercising it end-to-end.

Reference anchor: the reference's whole graft axis is decoding a real
binary payload (pydicom/pdf2image, extract_gcc_report_text_ou.py:46-56);
PNG is the format that IS feasible pure-stdlib in this container."""

import hashlib
import os
import struct
import zlib

import numpy as np
import pytest

from oct_report_ocr_spark.sources import multimodal as M

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "multimodal")

# (file, sha256[:16] of the committed bytes, w, h, mean_r, mean_g, mean_b)
GOLDEN = [
    ("rgb_mixed_9x7.png", "fc45357ad81c1920", 9, 7,
     0.525490196, 0.529411765, 0.533333333),
    ("rgba_paeth_6x8.png", "35349d25f98a7eae", 6, 8,
     0.388235294, 0.392156863, 0.396078431),
    ("gray_avg_11x3.png", "1de48bdc5eb1a85d", 11, 3,
     0.847058824, 0.847058824, 0.847058824),
]


@pytest.mark.parametrize("name,sha,w,h,r,g,b", GOLDEN)
def test_png_golden_fixtures(name, sha, w, h, r, g, b):
    """Byte-identity goldens: the committed .png files decode to pinned
    (width, height, mean RGB) — same feature contract as the BMP
    kernel. The sha pin proves the fixture bytes themselves are frozen
    (a regenerated-but-different fixture fails loudly)."""
    raw = open(os.path.join(FIXDIR, name), "rb").read()
    assert hashlib.sha256(raw).hexdigest()[:16] == sha
    dw, dh, dr, dg, db = M.decode_image(raw)
    assert (dw, dh) == (w, h)
    assert abs(dr - r) < 1e-9 and abs(dg - g) < 1e-9 and abs(db - b) < 1e-9


@pytest.mark.parametrize("color_type", [0, 2, 6])
@pytest.mark.parametrize("row_filters", [0, 1, 2, 3, 4, "mixed"])
def test_png_unfilter_exact_all_filter_types(color_type, row_filters):
    """Every filter type (None/Sub/Up/Average/Paeth) reconstructs the
    exact raster: the encoder filters a closed-form ramp, the decoder
    must return it bit-for-bit regardless of which filter was used."""
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = M.make_png(7, 9, seed=13, color_type=color_type, row_filters=row_filters)
    w, h, color, arr = M._png_raster(raw)
    truth = np.frombuffer(
        bytes((13 + i) % 256 for i in range(7 * 9 * bpp)), dtype=np.uint8
    ).reshape(9, 7, bpp)
    assert (w, h, color) == (7, 9, color_type)
    assert (arr == truth).all()


def test_png_corruption_quarantines():
    good = M.make_png(4, 4, seed=1)
    # flipped byte inside IHDR data -> CRC mismatch
    bad_crc = good[:18] + bytes([good[18] ^ 0xFF]) + good[19:]
    with pytest.raises(M.CorruptImage, match="crc"):
        M.decode_image(bad_crc)
    with pytest.raises(M.CorruptImage, match="truncated|missing IEND"):
        M.decode_image(good[:-20])
    # valid chunk framing but garbage deflate stream
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    bad_idat = M._PNG_MAGIC + ihdr + chunk(b"IDAT", b"not deflate") + chunk(b"IEND", b"")
    with pytest.raises(M.CorruptImage, match="inflate"):
        M.decode_image(bad_idat)
    # deflate ok but raster shorter than (stride+1)*h
    short = M._PNG_MAGIC + ihdr + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(M.CorruptImage, match="raster size"):
        M.decode_image(short)


def test_png_invalid_shapes_quarantine():
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )
    # r05: every VALID IHDR shape now decodes for real (16-bit, palette,
    # Adam7 — tests/test_multimodal_png_full.py). What remains here are
    # spec VIOLATIONS, which are corruption (quarantine), never a silent
    # wrong decode and no longer DecodeUnavailable:
    for depth, color, interlace, why in [
        (3, 0, 0, "depth not in {1,2,4,8,16}"),
        (4, 2, 0, "truecolor below 8-bit"),
        (16, 3, 0, "16-bit palette"),
        (1, 6, 0, "1-bit RGBA"),
        (8, 1, 0, "color type 1 undefined"),
        (8, 2, 2, "interlace method 2 undefined"),
    ]:
        ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace))
        b = M._PNG_MAGIC + ihdr + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b"")
        with pytest.raises(M.CorruptImage, match="invalid depth/color|bad interlace"):
            M.decode_image(b)


def test_png_resize_and_rgb_array():
    """The resize path decodes PNG via the shared raster kernel: output
    equals nearest-neighbor indexing of the known ramp; grayscale
    replicates channels, RGBA drops alpha."""
    b = M.make_png(8, 6, seed=3)
    out = M.resize_image(b, 4, 3)
    arr = M._decode_rgb_array(b)
    rows = (np.arange(3) * 6) // 3
    cols = (np.arange(4) * 8) // 4
    assert out == M._encode_ppm(arr[rows][:, cols])
    gray = M._decode_rgb_array(M.make_png(5, 4, seed=9, color_type=0))
    assert gray.shape == (4, 5, 3)
    assert (gray[:, :, 0] == gray[:, :, 1]).all() and (gray[:, :, 1] == gray[:, :, 2]).all()
    rgba = M._decode_rgb_array(M.make_png(5, 4, seed=9, color_type=6))
    assert rgba.shape == (4, 5, 3)


def test_png_real_decode_in_distributed_path(spark):
    """synth_media's every-5th decodable image rows now rotate
    BMP/PPM/PNG; the PNG rows must produce REAL features (width/height
    prefix), not the digest fake, through mapInPandas."""
    media = M.synth_media(spark, n=64)
    feats = {r.media_id: r for r in M.featurize(media, partitions=4).collect()}
    png_rows = 0
    for i in range(64):
        if i % 16 and i % 3 == 0 and i % 13 != 0 and i % 5 == 0 and (i // 15) % 4 == 2:
            w, h = 8 + i % 16, 4 + i % 8
            r = feats[i]
            assert r.decode_error is None
            assert r.feature[0] == float(w) and r.feature[1] == float(h)
            exp = M.decode_image(M.make_png(w, h, seed=i))
            assert abs(r.feature[2] - exp[2]) < 1e-6
            png_rows += 1
    assert png_rows >= 1
