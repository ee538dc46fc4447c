"""From-scratch PNG codec tests (sources/png.py): filter reconstruction,
color-type handling, hardening, and the Spark decode path."""

import struct
import zlib

import numpy as np
import pytest

from fluent_plugin_geoip_spark.sources.png import (
    PNG_SIG, _chunk, decode_png, encode_png,
)


def _rand_img(seed, h=11, w=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_every_filter(filt):
    px = _rand_img(42)
    assert np.array_equal(decode_png(encode_png(px, filters=filt)), px)


def test_roundtrip_sizes_and_gradients():
    # 1×1, single row, single column, and a smooth gradient (filters shine)
    for px in [
        np.array([[[1, 2, 3]]], dtype=np.uint8),
        np.arange(30, dtype=np.uint8).reshape(1, 10, 3),
        np.arange(30, dtype=np.uint8).reshape(10, 1, 3),
        (np.add.outer(np.arange(16), np.arange(16))[:, :, None]
         * np.array([3, 5, 7]) % 256).astype(np.uint8),
    ]:
        assert np.array_equal(decode_png(encode_png(px)), px)


def _manual_png(color_type, channels, rows, plte=None):
    """Hand-build a PNG with filter 0 rows for non-RGB color types."""
    h, w = len(rows), len(rows[0]) // channels
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_grayscale_and_alpha_color_types():
    g = _manual_png(0, 1, [[10, 20], [30, 40]])
    assert decode_png(g).tolist() == [[[10] * 3, [20] * 3],
                                      [[30] * 3, [40] * 3]]
    ga = _manual_png(4, 2, [[10, 255, 20, 0]])
    assert decode_png(ga).tolist() == [[[10] * 3, [20] * 3]]   # alpha dropped
    rgba = _manual_png(6, 4, [[1, 2, 3, 9, 4, 5, 6, 8]])
    assert decode_png(rgba).tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_palette_color_type():
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]            # R, G, B entries
    p = _manual_png(3, 1, [[0, 2], [1, 1]], plte=pal)
    assert decode_png(p).tolist() == [[[255, 0, 0], [0, 0, 255]],
                                      [[0, 255, 0], [0, 255, 0]]]
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_manual_png(3, 1, [[5]], plte=pal))


def test_hardening_rejects_corruption():
    good = encode_png(_rand_img(1))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + good[4:])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF                       # flip a byte inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    # truncated pixel stream: valid chunks, wrong inflated size
    ihdr = struct.pack(">II", 4, 4) + bytes([8, 2, 0, 0, 0])
    short = (PNG_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="pixel stream"):
        decode_png(short)
    with pytest.raises(ValueError, match="interlacing"):
        ihdr_i = struct.pack(">II", 1, 1) + bytes([8, 2, 0, 0, 1])
        decode_png(PNG_SIG + _chunk(b"IHDR", ihdr_i)
                   + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
                   + _chunk(b"IEND", b""))


def test_png_spark_decode_matches_ppm_path(spark):
    """The PNG and PPM generators share the pixel formula, so image_stats
    over both must agree row for row — certifying the full zlib+filter
    reconstruction against the already-oracle-gated PPM path."""
    from fluent_plugin_geoip_spark.operators.multimodal import (
        generate_png_images, generate_ppm_images, image_stats,
    )
    png = {r["media_id"]: r.asDict()
           for r in image_stats(generate_png_images(spark, 40)).collect()}
    ppm = {r["media_id"]: r.asDict()
           for r in image_stats(generate_ppm_images(spark, 40)).collect()}
    assert png == ppm and len(png) == 40
