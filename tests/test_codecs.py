import numpy as np

from webcollector_spark import codecs, fixtures


def test_png_roundtrip_exact():
    px = fixtures.ground_truth_pixels("img00000007", 64, 32)
    data = codecs.encode_png(px)
    out = codecs.decode(data)
    assert np.array_equal(out, px)
    assert codecs.psnr_db(px, out) == float("inf")


def test_lossy_psnr_above_gate():
    px = fixtures.ground_truth_pixels("img00000011", 128, 64)
    data = codecs.encode_lossy(px)
    out = codecs.decode(data)
    assert out.shape == px.shape
    p = codecs.psnr_db(px, out)
    assert p >= 40.0, p  # BASELINE.json input_hint invariant


def test_phash_deterministic_and_discriminative():
    a = fixtures.ground_truth_pixels("img00000001", 64, 64)
    b = fixtures.ground_truth_pixels("img00000002", 64, 64)
    assert codecs.phash64(a) == codecs.phash64(a)
    assert codecs.phash64(a) != codecs.phash64(b)
    # lossy encode must not move the phash (quantization error is tiny)
    assert codecs.phash64(codecs.decode(codecs.encode_lossy(a))) == codecs.phash64(a)


def test_corpus_generation_invariants():
    pdf = fixtures.make_corpus(30)
    assert len(pdf) == 30
    assert set(pdf["fmt"]) <= {"png", "jpeg"}
    for _, row in pdf.head(5).iterrows():
        px = codecs.decode(row["bytes"])
        gt = fixtures.ground_truth_pixels(row["image_id"], row["w"], row["h"])
        assert px.shape == gt.shape
        assert codecs.psnr_db(gt, px) >= 40.0
        assert row["caption"].startswith(f"caption of {row['image_id']}")
