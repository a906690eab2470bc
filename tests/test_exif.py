"""EXIF APP1 writer/parser round trip (both byte orders), damage
triage, orientation normalization semantics, and the Spark header-only
operator over the real-JPEG corpus."""

from __future__ import annotations

import numpy as np
import pytest

from webcollector_spark import fixtures
from webcollector_spark.exif import (
    ORIENTATION_OPS,
    build_exif_app1,
    insert_app1,
    normalize_orientation,
    parse_exif,
)


def _jpeg_with(app1_kwargs):
    base = fixtures.make_corpus_jpeg(1)["bytes"].iloc[0]
    return insert_app1(bytes(base), build_exif_app1(**app1_kwargs))


@pytest.mark.parametrize("order", ["II", "MM"])
def test_round_trip_all_fields(order):
    data = _jpeg_with(
        dict(
            make="Maker1",
            model="Cam-2",
            orientation=6,
            datetime="2026:03:14 01:59:26",
            description="a very long exif caption exceeding four bytes",
            pixel_x=640,
            pixel_y=480,
            byte_order=order,
        )
    )
    got = parse_exif(data)
    assert got["has_exif"] and got["byte_order"] == order
    assert got["make"] == "Maker1" and got["model"] == "Cam-2"
    assert got["orientation"] == 6
    assert got["datetime"] == "2026:03:14 01:59:26"
    assert got["description"] == "a very long exif caption exceeding four bytes"
    assert (got["pixel_x"], got["pixel_y"]) == (640, 480)


def test_partial_fields_and_no_subifd():
    got = parse_exif(_jpeg_with(dict(orientation=3, byte_order="MM")))
    assert got["has_exif"] and got["orientation"] == 3
    assert got["make"] is None and got["pixel_x"] is None


def test_no_exif_and_damage_triage():
    plain = bytes(fixtures.make_corpus_jpeg(1)["bytes"].iloc[0])
    assert parse_exif(plain) == {**parse_exif(plain), "has_exif": False}
    assert not parse_exif(b"not a jpeg")["has_exif"]
    ok = _jpeg_with(dict(orientation=1))
    # corrupt the TIFF magic inside APP1: triage, never raise
    broken = bytearray(ok)
    broken[12:14] = b"XX"
    assert not parse_exif(bytes(broken))["has_exif"]
    assert not parse_exif(ok[:16])["has_exif"]  # truncated prefix


def test_orientation_normalization_inverts_storage_transform():
    """For each tag, storing the true image under that orientation and
    normalizing must recover the true image (PIL exif_transpose table:
    2 flip-h, 3 rot180, 4 flip-v, 5 transpose, 6 rot90cw, 7 transverse,
    8 rot270cw)."""
    true = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    stored = {
        1: true,
        2: true[:, ::-1],
        3: true[::-1, ::-1],
        4: true[::-1, :],
        5: true.transpose(1, 0, 2),
        6: np.rot90(true, k=1),  # stored = true rotated 90 CCW
        7: true.transpose(1, 0, 2)[::-1, ::-1],
        8: np.rot90(true, k=-1),
    }
    for tag, s in stored.items():
        got = normalize_orientation(s, tag)
        assert np.array_equal(got, true), f"orientation {tag}"
    assert set(stored) == set(ORIENTATION_OPS)


def test_denormalize_inverts_normalize():
    true = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    from webcollector_spark.exif import denormalize_orientation

    for tag in range(1, 9):
        stored = denormalize_orientation(true, tag)
        assert np.array_equal(normalize_orientation(stored, tag), true), tag
        if tag >= 5:  # quarter-turn family transposes dims
            assert stored.shape[:2] == (6, 4)


def test_spark_exif_upright_decode(spark):
    from webcollector_spark.operators.images import (
        corpus_exif_rotated_df,
        exif_upright_decode,
    )

    got = exif_upright_decode(corpus_exif_rotated_df(spark, 24)).collect()
    assert len(got) == 24
    assert sorted({r.orientation for r in got}) == list(range(1, 9))
    assert all(r.psnr_ok and r.phash_match for r in got)
    for r in got:
        if r.orientation >= 5:
            assert (r.w_upright, r.h_upright) == (r.h_stored, r.w_stored)
        else:
            assert (r.w_upright, r.h_upright) == (r.w_stored, r.h_stored)


def test_spark_exif_meta_matches_fixture_arithmetic(spark):
    from webcollector_spark.operators.sniff import exif_meta

    pdf = fixtures.make_corpus_exif(40)
    sdf = spark.createDataFrame(pdf[["image_id", "bytes"]])
    got = {r.image_id: r for r in exif_meta(sdf).collect()}
    assert len(got) == 40
    for i, r in enumerate(pdf.to_dict("records")):
        f = fixtures.exif_fields_for(i, r["w"], r["h"])
        g = got[r["image_id"]]
        if not f:
            assert not g.has_exif
            continue
        assert g.has_exif and g.byte_order == f["byte_order"]
        assert g.orientation == f["orientation"]
        assert g.make == f["make"] and g.model == f["model"]
        assert g.datetime == f["datetime"]
        assert g.description == f.get("description")
        assert g.pixel_x == f.get("pixel_x") and g.pixel_y == f.get("pixel_y")
