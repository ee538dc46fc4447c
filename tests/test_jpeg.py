"""From-scratch baseline JPEG codec tests (sources/jpeg.py): exact
round-trip on the oracle-class inputs, bounded error on general images,
container hardening, and the Spark decode path."""

import numpy as np
import pytest

from fluent_plugin_geoip_spark.sources.jpeg import (
    _canonical_codes, _decode_table, _extend, _magnitude, _scaled_quant,
    AC_LUMA_SPEC, DC_LUMA_SPEC, Q_LUMA, decode_jpeg, encode_jpeg,
)


def _rand_img(seed, h=24, w=17):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _block_gray(mid, height=16, width=16):
    yy, xx = np.mgrid[0:height, 0:width]
    b = (yy // 8) * (width // 8) + xx // 8
    g = ((mid * 23 + b * 71) % 256).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def test_block_constant_gray_roundtrips_exactly():
    """The oracle-class input: constant-gray 8×8 blocks at quality 100
    decode bit-exact (single integral DC per block, all-ones tables,
    Cb=Cr=128). This is what licenses an independent-SQL oracle for a
    lossy format."""
    for mid in (0, 1, 7, 255, 1234):
        px = _block_gray(mid)
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=100)), px)


def test_quality100_bounded_error_and_odd_dims():
    """General content at quality 100: near-lossless (coefficients only
    rounded), and non-multiple-of-8 dims crop back exactly."""
    px = _rand_img(7)  # 24×17 — exercises edge padding + crop
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_lossy_quality_sane_on_smooth_content():
    """Smooth gradients survive quality 85 with tiny error (energy
    compaction); noise does not — both directions assert the transform +
    quant chain behaves like JPEG, not like a pass-through."""
    yy, xx = np.mgrid[0:32, 0:32]
    grad = np.stack([yy * 4, xx * 4, (yy + xx) * 2], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=85))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 6
    noise = _rand_img(3, 16, 16)
    lossy = decode_jpeg(encode_jpeg(noise, quality=85))
    assert not np.array_equal(lossy, noise)  # genuinely lossy
    # but the files shrink accordingly
    assert len(encode_jpeg(noise, quality=85)) < len(
        encode_jpeg(noise, quality=100))


def test_quality_scaling_endpoints():
    assert (_scaled_quant(Q_LUMA, 100) == 1).all()
    assert (_scaled_quant(Q_LUMA, 50) == Q_LUMA).all()
    with pytest.raises(ValueError):
        _scaled_quant(Q_LUMA, 0)


def test_huffman_tables_are_prefix_free_and_invertible():
    for spec in (DC_LUMA_SPEC, AC_LUMA_SPEC):
        codes = _canonical_codes(*spec)
        assert len(codes) == len(spec[1])
        # prefix-free: no code is a prefix of a longer one
        as_bits = {f"{c:0{ln}b}" for c, ln in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:
            assert not any(b != a and b.startswith(a) for b in as_bits)
        dec = _decode_table(*spec)
        for sym, (c, ln) in codes.items():
            assert dec[(ln, c)] == sym


def test_magnitude_extend_are_inverse():
    for v in range(-255, 256):
        cat, amp = _magnitude(v)
        assert _extend(amp, cat) == v


def test_hardening_rejects_corruption():
    good = encode_jpeg(_block_gray(3), quality=100)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00" + good)          # no SOI
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])               # truncated before SOS
    # progressive SOF2 must refuse loudly, not decode garbage
    prog = bytearray(good)
    prog[prog.index(0xC0, 2, 200)] = 0xC2    # SOF0 marker byte → SOF2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))


def test_jpeg_spark_decode_matches_formula(spark):
    """The Spark decode path: image_stats over real JPEG payloads equals
    the generator formula computed directly (the same equality the DuckDB
    oracle checks independently)."""
    from fluent_plugin_geoip_spark.operators.multimodal import (
        generate_jpeg_images, image_stats,
    )
    out = {r.media_id: r
           for r in image_stats(generate_jpeg_images(spark, 20)).collect()}
    assert len(out) == 20
    for mid in range(20):
        px = _block_gray(mid).astype(np.int64)
        r = out[mid]
        assert (r.width, r.height) == (16, 16)
        assert r.sum_r == r.sum_g == r.sum_b == int(px[:, :, 0].sum())


def test_fill_bytes_and_standalone_markers_tolerated():
    """Spec-legal inter-segment padding (runs of 0xFF before a marker,
    ITU T.81 B.1.1.2) and standalone markers (TEM 0xFF01, stray RSTn)
    must parse transparently — real web-crawl JPEGs contain both
    (round-6 ADVICE: these previously misparsed as length-prefixed
    segments)."""
    px = _block_gray(99)
    enc = encode_jpeg(px, quality=100)
    # inject after SOI: fill bytes, a TEM, more fill, a stray RST3
    doctored = (enc[:2]
                + b"\xff\xff\xff"          # fill run, next marker reads APP0
                + b"\xff\x01"              # TEM (standalone)
                + b"\xff\xff\xd3"          # fill + stray RST3 (standalone)
                + enc[2:])
    assert np.array_equal(decode_jpeg(doctored), px)


def test_truncated_after_fill_still_clean_error():
    px = _block_gray(5)
    enc = encode_jpeg(px, quality=100)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(enc[:2] + b"\xff\xff")
