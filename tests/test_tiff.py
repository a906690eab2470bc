"""Baseline-RGB TIFF codec (webcollector_spark.tiff): lossless round
trips across byte orders and compressions, PackBits as a standalone
RLE, honest NotImplementedError boundaries, header sniff, and the
Spark dataflow vs the committed oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webcollector_spark import codecs, fixtures, tiff


@pytest.mark.parametrize("byte_order", ["<", ">"], ids=["II", "MM"])
@pytest.mark.parametrize(
    "compression,predictor",
    [(1, 1), (32773, 1), (5, 1), (5, 2)],
    ids=["none", "packbits", "lzw", "lzw-pred2"],
)
def test_roundtrip_bit_exact(byte_order, compression, predictor):
    rng = np.random.default_rng(31)
    for h, w in [(1, 1), (16, 32), (33, 33), (17, 31)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        data = tiff.encode_tiff(
            px, byte_order=byte_order, compression=compression,
            rows_per_strip=16, predictor=predictor,
        )
        assert np.array_equal(tiff.decode_tiff(data), px)
        assert np.array_equal(codecs.decode(data), px)  # magic dispatch
        fmt, sw, sh = codecs.sniff_header(data[:4096])
        assert (fmt, sw, sh) == ("tiff", w, h)


def test_lzw_earlychange_and_clear_boundaries():
    """The TIFF-LZW specifics: MSB-first packing, width bumps one code
    EARLY (decoder one entry earlier than encoder), mid-stream Clear
    at 4094 entries — exercised by streams long enough to cross every
    width boundary and force table resets."""
    rng = np.random.default_rng(32)
    cases = [
        b"",
        b"A",
        b"AB" * 5000,  # crosses 9->10->11 bit widths
        bytes(rng.integers(0, 256, 20000).astype(np.uint8)),  # full-width
        bytes(rng.integers(0, 4, 100000).astype(np.uint8)),  # multi-Clear
        b"\x00" * 70000,  # degenerate run
    ]
    for data in cases:
        enc = tiff.tiff_lzw_encode(data)
        assert tiff.tiff_lzw_decode(enc, len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        tiff.tiff_lzw_decode(tiff.tiff_lzw_encode(b"hello world")[:3], 11)


def test_lzw_predictor_compresses_smooth_content():
    smooth = (
        128 + 90 * np.sin(np.add.outer(np.arange(48) / 7, np.arange(40) / 5))
    )[..., None].repeat(3, -1).astype(np.uint8)
    none_sz = len(tiff.encode_tiff(smooth))
    lzw = len(tiff.encode_tiff(smooth, compression=5))
    pred = len(tiff.encode_tiff(smooth, compression=5, predictor=2))
    assert pred < lzw < none_sz  # differencing beats raw LZW beats raw


def test_packbits_unit_roundtrip_and_packet_shapes():
    rng = np.random.default_rng(32)
    for _ in range(100):
        raw = bytes(rng.integers(0, 4, rng.integers(0, 300)).astype(np.uint8))
        enc = tiff.packbits_encode(raw)
        assert tiff.packbits_decode(enc, len(raw)) == raw
    # a long run becomes repeat packets: 2 bytes per 128-byte run
    run = b"\x07" * 300
    enc = tiff.packbits_encode(run)
    assert len(enc) <= 8
    assert tiff.packbits_decode(enc, 300) == run
    # the 0x80 no-op byte is skipped on decode
    assert tiff.packbits_decode(b"\x80\x00A", 1) == b"A"
    with pytest.raises(ValueError, match="truncated"):
        tiff.packbits_decode(b"\x05AB", 6)


def test_packbits_compresses_flat_strips():
    flat = np.full((64, 64, 3), 7, np.uint8)
    assert len(tiff.encode_tiff(flat, compression=32773)) < (
        len(tiff.encode_tiff(flat)) / 10
    )


def test_multi_strip_layout_with_short_final_strip():
    """33 rows at 16 rows/strip = 3 strips, the last only 1 row; the
    strip table goes out-of-line (count > 1) and must still resolve."""
    rng = np.random.default_rng(33)
    px = rng.integers(0, 256, (33, 8, 3)).astype(np.uint8)
    data = tiff.encode_tiff(px, rows_per_strip=16)
    ifd_off = struct.unpack_from("<I", data, 4)[0]
    n = struct.unpack_from("<H", data, ifd_off)[0]
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, count)
    assert tags[273] == (4, 3) and tags[279] == (4, 3)  # 3 strips
    assert np.array_equal(tiff.decode_tiff(data), px)


def test_unsupported_features_raise():
    px = np.zeros((8, 8, 3), np.uint8)
    good = tiff.encode_tiff(px)
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff.decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        tiff.decode_tiff(b"II" + struct.pack("<HI", 43, 8) + good[8:])

    def patch_entry(data, tag, value):
        out = bytearray(data)
        ifd_off = struct.unpack_from("<I", out, 4)[0]
        n = struct.unpack_from("<H", out, ifd_off)[0]
        for i in range(n):
            pos = ifd_off + 2 + 12 * i
            t = struct.unpack_from("<H", out, pos)[0]
            if t == tag:
                struct.pack_into("<HH", out, pos + 8, value, 0)
                return bytes(out)
        raise AssertionError(f"tag {tag} not found")

    with pytest.raises(NotImplementedError, match="compression 7"):
        tiff.decode_tiff(patch_entry(good, 259, 7))  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="predictor 3"):
        lzw = tiff.encode_tiff(px, compression=5, predictor=2)
        tiff.decode_tiff(patch_entry(lzw, 317, 3))  # float predictor
    # palette is supported in r5, but an RGB file relabeled photometric
    # 3 has no ColorMap and must refuse rather than mis-decode
    with pytest.raises(ValueError, match="ColorMap"):
        tiff.decode_tiff(patch_entry(good, 262, 3))
    # grayscale is supported in r5; an RGB file relabeled photometric
    # 1 trips the samples-per-pixel cross-check instead
    with pytest.raises(NotImplementedError, match="samples/pixel"):
        tiff.decode_tiff(patch_entry(good, 262, 1))
    with pytest.raises(NotImplementedError, match="photometric 5"):
        tiff.decode_tiff(patch_entry(good, 262, 5))  # CMYK
    with pytest.raises(NotImplementedError, match="samples/pixel"):
        tiff.decode_tiff(patch_entry(good, 277, 1))
    with pytest.raises(NotImplementedError, match="planar"):
        tiff.decode_tiff(patch_entry(good, 284, 2))
    with pytest.raises(ValueError, match="strip out of range"):
        tiff.decode_tiff(good[:-4])


def test_corpus_is_lossless_and_mixes_variants():
    corpus = fixtures.make_corpus_tiff(12)
    orders, comps = set(), set()
    for r in corpus.to_dict("records"):
        data = bytes(r["bytes"])
        got = codecs.decode(data)
        truth = fixtures.ground_truth_pixels(r["image_id"], r["w"], r["h"])
        assert np.array_equal(got, truth)
        assert codecs.phash64(got) == r["phash"]
        orders.add(data[:2])
        e = "<" if data[:2] == b"II" else ">"
        ifd_off = struct.unpack_from(e + "I", data, 4)[0]
        n = struct.unpack_from(e + "H", data, ifd_off)[0]
        for i in range(n):
            pos = ifd_off + 2 + 12 * i
            if struct.unpack_from(e + "H", data, pos)[0] == 259:
                comps.add(struct.unpack_from(e + "H", data, pos + 8)[0])
    assert orders == {b"II", b"MM"}
    assert comps == {1, 5, 32773}


def test_spark_dataflow_matches_committed_oracle(spark):
    import pandas as pd

    from webcollector_spark.operators import images

    got = (
        images.decode_verify(images.corpus_tiff_df(spark))
        .orderBy("image_id")
        .toPandas()
    )
    exp = (
        pd.read_parquet("oracles/image_decode_verify_tiff.parquet")
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == 100
    assert got["psnr_ok"].all() and got["phash_match"].all()
    assert (got["image_id"].values == exp["image_id"].values).all()
    assert np.allclose(got["psnr_db"].values, exp["psnr_db"].values)


# ---------------------------------------------------------------------------
# Tile organization + palette-color (r5).


def test_tiled_roundtrips_every_codec_and_order():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    for bo in ("<", ">"):
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                enc = tiff.encode_tiff_tiled(px, 16, 32, bo, comp, pred)
                got = tiff.decode_tiff(enc)
                assert np.array_equal(got, px), (bo, comp, pred)


def test_tiled_edge_padding_clipped_exactly():
    """37x53 with 16x32 tiles: both edges partial — padding must never
    leak into the output, and the tile grid must be 4 across, 2 down."""
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    enc = tiff.encode_tiff_tiled(px, 16, 32)
    assert np.array_equal(tiff.decode_tiff(enc), px)
    # exact tile-size single-tile case
    one = rng.integers(0, 256, size=(32, 16, 3)).astype(np.uint8)
    assert np.array_equal(
        tiff.decode_tiff(tiff.encode_tiff_tiled(one, 16, 32)), one
    )


def test_tiled_non_multiple_of_16_refused_on_encode():
    px = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(AssertionError, match="x16"):
        tiff.encode_tiff_tiled(px, 15, 16)


def test_palette_roundtrips_and_high_byte_rule():
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, size=(29, 41)).astype(np.uint8)
    cmap = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    for comp in (1, 5, 32773):
        enc = tiff.encode_tiff_palette(idx, cmap, "<", comp)
        assert np.array_equal(tiff.decode_tiff(enc), cmap[idx]), comp
    # the 16-bit map scales by 257, so the round trip is exact at the
    # high byte for EVERY 8-bit value (0xFF -> 0xFFFF >> 8 == 0xFF)
    full = np.arange(256, dtype=np.uint8).reshape(16, 16)
    gray = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    got = tiff.decode_tiff(tiff.encode_tiff_palette(full, gray))
    assert np.array_equal(got[:, :, 0], full)


def test_palette_missing_colormap_raises():
    rng = np.random.default_rng(10)
    idx = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    cmap = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    data = bytearray(tiff.encode_tiff_palette(idx, cmap))
    # zero out the ColorMap tag id (320 -> 0) in the sorted IFD
    import struct as _s

    n = _s.unpack_from("<H", data, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if _s.unpack_from("<H", data, off)[0] == 320:
            _s.pack_into("<H", data, off, 999)
    with pytest.raises(ValueError, match="ColorMap"):
        tiff.decode_tiff(bytes(data))


def test_grayscale_both_photometrics_roundtrip():
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, size=(23, 31)).astype(np.uint8)
    want = np.repeat(g[:, :, None], 3, axis=2)
    for comp in (1, 5, 32773):
        # BlackIsZero: stored as-is
        enc = tiff.encode_tiff_gray(g, "<", comp)
        assert np.array_equal(tiff.decode_tiff(enc), want), comp
        # WhiteIsZero: stored inverted, decode re-inverts
        enc0 = tiff.encode_tiff_gray(g, ">", comp, white_is_zero=True)
        assert np.array_equal(tiff.decode_tiff(enc0), want), comp
        # really inverted on disk: the raster bytes differ
        assert enc[-g.size :] != enc0[-g.size :] or comp != 1
