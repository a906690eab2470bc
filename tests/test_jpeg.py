"""Tests for the pure-numpy baseline JPEG codec (webcollector_spark.jpeg)
and its wiring into the decode operators.

This is the real-compressed-bytes path that retires the QIMG stand-in
as the only lossy codec (VERDICT r3 item 5): DCT + canonical Huffman +
byte stuffing + restart markers, round-tripped at the bitstream level.
Reference anchor: Page content bytes are real compressed payloads
(model/Page.java:323-330); the PSNR>=40dB gate is the BASELINE.json
input_hint invariant.
"""

import numpy as np
import pytest

from webcollector_spark import codecs, fixtures, jpeg
from webcollector_spark.operators import images, media


def _noise(w, h, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _gradient(w, h):
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    return np.stack([x + 0 * y, y + 0 * x, (x + y) / 2], axis=-1).astype(np.uint8)


def test_roundtrip_noise_above_gate():
    # full-range noise is the worst case for DCT quantization — the
    # default quality must still clear the input_hint 40 dB gate
    px = _noise(64, 48)
    out = jpeg.decode_baseline(jpeg.encode_baseline(px))
    assert out.shape == px.shape and out.dtype == np.uint8
    assert codecs.psnr_db(px, out) >= 40.0


def test_roundtrip_structured_much_higher():
    px = _gradient(80, 56)
    out = jpeg.decode_baseline(jpeg.encode_baseline(px))
    assert codecs.psnr_db(px, out) >= 50.0


def test_roundtrip_grayscale():
    px = _noise(40, 32)[..., 0]
    out = jpeg.decode_baseline(jpeg.encode_baseline(px))
    assert out.shape == px.shape  # 1-component stream stays HxW
    assert codecs.psnr_db(px, out) >= 40.0


def test_odd_dimensions_pad_and_crop():
    # non-multiple-of-8 edges exercise the pad (encode) / crop (decode)
    # path; PSNR is measured on the unpadded region only
    px = _noise(37, 29)
    out = jpeg.decode_baseline(jpeg.encode_baseline(px))
    assert out.shape == px.shape
    assert codecs.psnr_db(px, out) >= 40.0


def test_byte_stuffing_present_and_transparent():
    # a busy image reliably produces 0xFF bytes in the entropy segment;
    # they must be stuffed (FF 00) on the wire and stripped on decode
    px = _noise(64, 64, seed=3)
    data = jpeg.encode_baseline(px)
    sos = data.index(b"\xff\xda")
    assert b"\xff\x00" in data[sos:]  # stuffing actually occurred
    assert codecs.psnr_db(px, jpeg.decode_baseline(data)) >= 40.0


def test_restart_interval_bitstream_and_equality():
    px = _noise(64, 48, seed=11)
    plain = jpeg.encode_baseline(px, restart_interval=0)
    rst = jpeg.encode_baseline(px, restart_interval=4)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))  # RSTn
    # the DC-predictor resets must be bit-faithful: both streams decode
    # to the identical pixel array (same quantized coefficients)
    assert np.array_equal(jpeg.decode_baseline(plain), jpeg.decode_baseline(rst))


def test_unsupported_streams_raise_not_garble():
    px = _noise(24, 16)
    data = bytearray(jpeg.encode_baseline(px))
    # extended sequential (12-bit class): SOF0 (FFC0) -> SOF1 (FFC1).
    # progressive (SOF2) is SUPPORTED — see test_jpeg_progressive.py.
    ext = bytes(data).replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(ValueError, match="SOF0"):
        jpeg.decode_baseline(ext)
    # sampling factors beyond 2 (legal in the spec, absent on the web):
    # patch the Y sampling byte inside SOF0 to 3x3
    sof = bytes(data).index(b"\xff\xc0")
    sub = bytearray(data)
    sub[sof + 11] = 0x33  # component 1 sampling 1x1 -> 3x3
    with pytest.raises(ValueError, match="sampling factors"):
        jpeg.decode_baseline(bytes(sub))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_baseline(b"\x00\x01\x02")


def test_decode_baseline_at_concatenated_frames():
    # the MJPEG seam: frame boundaries come from marker structure, so
    # back-to-back images decode at exact offsets
    a, b = _noise(16, 16, seed=1), _noise(16, 16, seed=2)
    ea, eb = jpeg.encode_baseline(a), jpeg.encode_baseline(b)
    stream = ea + eb
    fa, pos = jpeg.decode_baseline_at(stream, 0)
    assert pos == len(ea)
    fb, end = jpeg.decode_baseline_at(stream, pos)
    assert end == len(stream)
    assert codecs.psnr_db(a, fa) >= 40.0 and codecs.psnr_db(b, fb) >= 40.0
    assert not np.array_equal(fa, fb)


def test_codecs_dispatch_on_soi_magic():
    px = _noise(32, 24, seed=5)
    data = jpeg.encode_baseline(px)
    assert data[:2] == b"\xff\xd8"
    out = codecs.decode(data)  # codecs.decode dispatches on magic
    assert codecs.psnr_db(px, out) >= 40.0


def test_make_corpus_jpeg_invariants():
    pdf = fixtures.make_corpus_jpeg(12)
    assert set(pdf["fmt"]) == {"jpeg"}
    dri = 0
    for _, row in pdf.iterrows():
        assert bytes(row["bytes"][:2]) == b"\xff\xd8"
        px = codecs.decode(row["bytes"])
        gt = fixtures.ground_truth_pixels(row["image_id"], row["w"], row["h"])
        assert px.shape == gt.shape
        assert codecs.psnr_db(gt, px) >= 40.0
        assert codecs.phash64(px) == row["phash"]
        dri += b"\xff\xdd" in bytes(row["bytes"])
    assert dri > 0  # every third image carries a restart interval


def test_jpeg_corpus_through_decode_verify(spark):
    # the registry row's dataflow: real DCT+Huffman bytes through the
    # Arrow-batched verify operator, every row passing both gates
    out = images.decode_verify(images.corpus_jpeg_df(spark, n=24)).collect()
    assert len(out) == 24
    assert all(r["psnr_ok"] and r["phash_match"] for r in out)
    assert all(r["fmt"] == "jpeg" for r in out)


def test_mjpeg_video_through_sample_frames(spark):
    # fmt='mjpeg' dispatch: concatenated baseline-JPEG frames through
    # the same mapInPandas operator as the stub/ppm paths
    rng = np.random.default_rng(21)
    rows = []
    metas = {}
    for i in range(3):
        vid = f"mjpg{i:04d}"
        frames = [
            rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
            for _ in range(8)
        ]
        data = media.encode_mjpeg_stream(frames)
        metas[vid] = data
        rows.append((vid, data, 8, 24.0, 16, 12, "mjpeg", f"caption of {vid}"))
    vids = spark.createDataFrame(rows, schema=media.VIDEO_SCHEMA)
    out = media.sample_frames(vids, every_n=4)
    assert out.schema == media.FRAME_SCHEMA
    got = out.collect()
    assert {r["video_id"] for r in got} == set(metas)
    for r in got:
        decoded = dict(
            media.decode_video_mjpeg(r["video_id"], metas[r["video_id"]], 8, 16, 12)
        )
        assert abs(r["frame_mean"] - float(decoded[r["frame_idx"]].mean())) < 1e-3


def test_mjpeg_metadata_mismatch_raises():
    frames = [np.zeros((12, 16, 3), dtype=np.uint8)]
    data = media.encode_mjpeg_stream(frames)
    with pytest.raises(ValueError, match="metadata"):
        list(media.decode_video_mjpeg("v", data, 1, 8, 8))


# -- header-only quality estimation (jpeg.parse_dqt / estimate_quality,
#    operators/sniff.py jpeg_quality) ----------------------------------------


def test_ijg_luma_scaling_injective_and_invertible():
    # the estimate_quality docstring's load-bearing claim: the luma
    # inversion is exact and unique over the whole 1..100 range
    seen = {}
    for q in range(1, 101):
        t = tuple(jpeg._quality_scale(jpeg.STD_LUMA_Q, q))
        assert t not in seen, f"q={q} collides with q={seen[t]}"
        seen[t] = q
        q_est, exact = jpeg.estimate_quality(
            jpeg._quality_scale(jpeg.STD_LUMA_Q, q), jpeg.STD_LUMA_Q
        )
        assert (q_est, exact) == (q, True)


def test_ijg_chroma_collisions_resolve_low():
    # chroma clips every entry to 255 at q<=3, so 1..3 are one class;
    # ties resolve to the LOWER q (conservative for a keep/drop gate)
    for q in range(1, 101):
        q_est, exact = jpeg.estimate_quality(
            jpeg._quality_scale(jpeg.STD_CHROMA_Q, q), jpeg.STD_CHROMA_Q
        )
        assert exact
        assert q_est == (1 if q <= 3 else q)


def test_parse_dqt_roundtrips_encoder_tables():
    px = _gradient(24, 16)
    for q in (25, 50, 75, 92):
        tables = jpeg.parse_dqt(jpeg.encode_baseline(px, quality=q))
        assert set(tables) == {0, 1}
        assert np.array_equal(tables[0], jpeg._quality_scale(jpeg.STD_LUMA_Q, q))
        assert np.array_equal(tables[1], jpeg._quality_scale(jpeg.STD_CHROMA_Q, q))


def test_parse_dqt_grayscale_single_table():
    data = jpeg.encode_baseline(_gradient(24, 16)[..., 0], quality=68)
    tables = jpeg.parse_dqt(data)
    assert set(tables) == {0}
    assert np.array_equal(tables[0], jpeg._quality_scale(jpeg.STD_LUMA_Q, 68))


def test_parse_dqt_truncated_prefix_and_non_jpeg():
    data = jpeg.encode_baseline(_gradient(24, 16), quality=75)
    # find the second DQT segment and cut mid-payload: the complete
    # first table must survive, the truncated one must not appear
    first = data.index(b"\xff\xdb")
    second = data.index(b"\xff\xdb", first + 2)
    tables = jpeg.parse_dqt(data[: second + 30])
    assert set(tables) == {0}
    assert jpeg.parse_dqt(b"QIMG not a jpeg") == {}
    assert jpeg.parse_dqt(b"\xff\xd8") == {}  # SOI alone: no tables yet


def test_jpeg_quality_operator_recovers_ladder(spark):
    from webcollector_spark.operators.sniff import jpeg_quality

    df = images.corpus_mixed_df(spark).unionByName(
        images.corpus_jpeg_quality_df(spark, 24)
    )
    rows = {r["image_id"]: r for r in jpeg_quality(df).collect()}
    assert len(rows) == 444
    for iid, r in rows.items():
        if iid.startswith("jq"):
            q = fixtures.jpeg_quality_for(int(iid[2:]))
            assert r["is_jpeg"] and r["n_tables"] == 2 and r["dqt_std"]
            assert (r["quality_luma"], r["quality_chroma"], r["quality_est"]) == (q, q, q)
        elif iid.startswith("jpg"):
            assert r["is_jpeg"] and r["quality_est"] == 98
        else:
            # png/qimg/gif payloads — INCLUDING the 16 base-corpus rows
            # mislabeled fmt="jpeg": the operator keys on payload magic
            assert not r["is_jpeg"] and r["n_tables"] == 0
            assert r["quality_est"] is None and r["dqt_std"] is None


def test_jpeg_quality_flags_nonstandard_tables(spark):
    from webcollector_spark.operators.sniff import jpeg_quality

    # hand-build a JPEG-shaped header whose DQT is NOT an IJG scaling:
    # dqt_std must come back False while the estimate stays defined
    custom = jpeg._quality_scale(jpeg.STD_LUMA_Q, 80).copy()
    custom[0] += 1
    seg = bytes([0]) + bytes(int(x) for x in custom[jpeg.ZIGZAG])
    data = (
        b"\xff\xd8"
        + b"\xff\xdb"
        + (len(seg) + 2).to_bytes(2, "big")
        + seg
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [("custom0", bytearray(data))], "image_id string, bytes binary"
    )
    (r,) = jpeg_quality(df).collect()
    assert r["is_jpeg"] and r["n_tables"] == 1
    assert r["quality_luma"] == 80 and r["dqt_std"] is False
    assert r["quality_chroma"] is None and r["quality_est"] == 80


# -- chroma subsampling (4:2:0 / 4:2:2) ---------------------------------------


def _straightline_subsampled(px, quality, sub):
    """Independent DCT-domain reconstruction — same math as the codec
    but NO bitstream anywhere: pins the entropy/interleave layers as
    bit-exact, even on full-range noise."""
    ycc = jpeg.rgb_to_ycbcr(px)
    samps = jpeg._SAMP_FACTORS[sub]
    h, w = px.shape[:2]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qt = [
        jpeg._quality_scale(jpeg.STD_LUMA_Q, quality).reshape(8, 8),
        jpeg._quality_scale(jpeg.STD_CHROMA_Q, quality).reshape(8, 8),
    ]
    out = []
    for ci in range(3):
        hi, vi = samps[ci]
        plane = jpeg._box_down(ycc[..., ci], vmax // vi, hmax // hi)
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(
            plane,
            ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])),
            mode="edge",
        )
        blocks, bh, bw = jpeg._to_blocks(plane - 128.0)
        coefs = np.einsum("ij,njk,lk->nil", jpeg._C, blocks, jpeg._C)
        dq = np.round(coefs / qt[min(ci, 1)]) * qt[min(ci, 1)]
        rec = np.einsum("ji,njk,kl->nil", jpeg._C, dq, jpeg._C) + 128.0
        ch, cw = -(-(h * vi) // vmax), -(-(w * hi) // hmax)
        pl = jpeg._from_blocks(rec, bh, bw, ch, cw)
        if vi != vmax or hi != hmax:
            pl = np.repeat(
                np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        out.append(pl)
    return jpeg.ycbcr_to_rgb(np.stack(out, axis=-1))


def test_subsampled_bitstream_bit_exact_vs_straightline():
    # noise is the adversarial input: every AC coefficient populated,
    # every Huffman path and the full MCU interleave exercised
    for w, h in ((64, 48), (33, 17), (16, 16), (31, 64)):
        px = _noise(w, h, seed=w * 100 + h)
        for sub in ("444", "422", "420", "411", "440"):
            got = jpeg.decode_baseline(
                jpeg.encode_baseline(px, quality=85, subsampling=sub)
            )
            assert np.array_equal(got, _straightline_subsampled(px, 85, sub)), (
                w, h, sub,
            )


def test_subsampled_restart_markers_roundtrip():
    px = fixtures.smooth_field_pixels(5, 48, 32)
    for sub in ("420", "422", "411", "440"):
        plain = jpeg.decode_baseline(
            jpeg.encode_baseline(px, quality=90, subsampling=sub)
        )
        with_rst = jpeg.decode_baseline(
            jpeg.encode_baseline(
                px, quality=90, subsampling=sub, restart_interval=2
            )
        )
        # RSTn only re-packages the stream; decoded pixels are identical
        assert np.array_equal(plain, with_rst), sub


def test_subsampled_sof_declares_factors_and_sniffs():
    px = fixtures.smooth_field_pixels(9, 40, 24)
    data = jpeg.encode_baseline(px, quality=90, subsampling="420")
    sof = data.index(b"\xff\xc0")
    assert data[sof + 11] == 0x22  # luma 2x2
    assert data[sof + 14] == 0x11 and data[sof + 17] == 0x11  # chroma 1x1
    fmt, w, h = codecs.sniff_header(data)
    assert (fmt, w, h) == ("jpeg", 40, 24)
    # header-only quality estimation is layout-independent
    tables = jpeg.parse_dqt(data)
    assert jpeg.estimate_quality(tables[0], jpeg.STD_LUMA_Q) == (90, True)


def test_make_corpus_jpeg_subsampled_invariants():
    pdf = fixtures.make_corpus_jpeg_subsampled(24)
    assert len(pdf) == 24
    for i, r in enumerate(pdf.to_dict("records")):
        px = codecs.decode(bytes(r["bytes"]))
        truth = fixtures.ground_truth_pixels(r["image_id"], r["w"], r["h"])
        assert px.shape == truth.shape
        assert codecs.psnr_db(px, truth) >= 40.0
        assert codecs.phash64(px) == int(r["phash"])
        # the declared layout is actually in the SOF header
        sof = bytes(r["bytes"]).index(b"\xff\xc0")
        want = (0x22, 0x22, 0x21, 0x22, 0x41, 0x12)[i % 6]
        assert bytes(r["bytes"])[sof + 11] == want


def test_subsampled_corpus_through_decode_verify(spark):
    rows = images.decode_verify(
        images.corpus_jpeg_subsampled_df(spark, 24)
    ).collect()
    assert len(rows) == 24
    assert all(r["psnr_ok"] and r["phash_match"] for r in rows)
