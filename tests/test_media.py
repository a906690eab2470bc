"""Audio/video plumbing tests: frame sampling fan-out (UDTF shape),
deterministic stub decode (recomputable ground truth), audio feature
batch shape, scene-cut window."""

from __future__ import annotations

import numpy as np

from webcollector_spark.operators import media


def test_sample_frames_fanout_and_determinism(spark):
    vids = media.make_video_corpus(spark, 8)
    frames = media.sample_frames(vids, every_n=4).collect()
    meta = {r["video_id"]: r for r in vids.collect()}
    by_vid: dict[str, list] = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert set(by_vid) == set(meta)
    for vid, rows in by_vid.items():
        m = meta[vid]
        want_idx = list(range(0, m["n_frames"], 4))
        assert sorted(r["frame_idx"] for r in rows) == want_idx
        # recompute one frame's mean from the stub decoder
        r0 = min(rows, key=lambda r: r["frame_idx"])
        idx, frame = next(
            media._decode_video_stub(
                vid, bytes(m["bytes"]), m["n_frames"], m["w"], m["h"]
            )
        )
        assert idx == 0
        assert abs(r0["frame_mean"] - float(frame.mean())) < 1e-3
        assert abs(r0["ts_sec"] - 0.0) < 1e-9


def test_audio_features(spark):
    aud = media.make_audio_corpus(spark, 6)
    feats = {r["audio_id"]: r for r in media.audio_features(aud).collect()}
    meta = {r["audio_id"]: r for r in aud.collect()}
    assert set(feats) == set(meta)
    for aid, f in feats.items():
        m = meta[aid]
        assert abs(f["duration_sec"] - m["n_samples"] / m["sample_rate"]) < 1e-3
        # uniform [-1,1] waveform: rms ~ 1/sqrt(3) ~ 0.577
        assert 0.5 < f["rms"] < 0.65
        assert f["zero_crossings"] > 0


def test_scene_cuts_runs(spark):
    vids = media.make_video_corpus(spark, 5)
    frames = media.sample_frames(vids, every_n=2)
    cuts = media.scene_cuts(frames, threshold=0.0).collect()
    # with threshold 0 every consecutive pair with nonzero delta appears
    assert len(cuts) > 0
    assert all(c["delta"] >= 0 for c in cuts)


def test_unknown_fmt_raises():
    """The production seam: an unregistered fmt (a compressed codec the
    sandbox can't decode) must fail loudly, per row, naming the registry
    to extend."""
    import pytest

    with pytest.raises(NotImplementedError, match="_VIDEO_CODECS"):
        media._video_decoder("h264")
    with pytest.raises(NotImplementedError, match="_AUDIO_CODECS"):
        media._audio_decoder("mp3")


def test_ppm_roundtrip_bit_exact():
    """decode_video_real(encode_ppm_stream(x)) == x, frame for frame."""
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8) for _ in range(5)
    ]
    data = media.encode_ppm_stream(frames)
    out = list(media.decode_video_real("v", data, 5, 16, 12))
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (_, got), want in zip(out, frames):
        assert np.array_equal(got, want)


def test_ppm_decoder_handles_comments_and_checks_metadata():
    import pytest

    rng = np.random.default_rng(8)
    fr = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    # a P6 header with a comment line — legal PPM that naive split misses
    data = b"P6\n# made by test\n6 4\n255\n" + fr.tobytes()
    (_, got), = list(media.decode_video_real("v", data, 1, 6, 4))
    assert np.array_equal(got, fr)
    with pytest.raises(ValueError, match="metadata says"):
        list(media.decode_video_real("v", data, 1, 5, 4))


def test_wav_roundtrip_and_foreign_chunks():
    """decode_audio_real inverts encode_wav to PCM16 precision and
    tolerates extra RIFF chunks before `data` (real writers emit LIST
    etc.)."""
    import struct

    rng = np.random.default_rng(9)
    wave = (rng.random(5000, dtype=np.float32) * 2.0 - 1.0)
    data = media.encode_wav(wave, 8000)
    got = media.decode_audio_real("a", data, 5000)
    assert got.dtype == np.float32
    assert np.max(np.abs(got - np.clip(wave, -1, 1))) <= 1.0 / 32767 + 1e-7
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:fmt_end] + foreign + data[fmt_end:]
    got2 = media.decode_audio_real("a", spliced, 5000)
    assert np.array_equal(got, got2)


def test_real_video_corpus_through_sample_frames(spark):
    """The REAL decode path produces the same downstream schema and
    ground-truth-recomputable features as the stub path — the seam is
    exercised end to end, not just declared."""
    vids = media.make_real_video_corpus(spark, n=4, n_frames=8)
    out = media.sample_frames(vids, every_n=4)
    assert out.schema == media.FRAME_SCHEMA
    rows = out.collect()
    meta = {r["video_id"]: r for r in vids.collect()}
    assert {r["video_id"] for r in rows} == set(meta)
    for r in rows:
        m = meta[r["video_id"]]
        frames = dict(
            media.decode_video_real(
                r["video_id"], bytes(m["bytes"]), m["n_frames"], m["w"], m["h"]
            )
        )
        assert abs(r["frame_mean"] - float(frames[r["frame_idx"]].mean())) < 1e-3


def test_real_audio_corpus_through_audio_features(spark):
    aud = media.make_real_audio_corpus(spark, n=4)
    out = media.audio_features(aud)
    assert out.schema == media.AUDIO_FEAT_SCHEMA
    feats = {r["audio_id"]: r for r in out.collect()}
    meta = {r["audio_id"]: r for r in aud.collect()}
    assert set(feats) == set(meta)
    for aid, f in feats.items():
        m = meta[aid]
        assert abs(f["duration_sec"] - m["n_samples"] / m["sample_rate"]) < 1e-3
        assert 0.5 < f["rms"] < 0.65  # uniform [-1,1] -> ~0.577


def test_mixed_fmt_single_dataframe(spark):
    """One DataFrame mixing stub and real payloads: per-row dispatch,
    both decode correctly in the same Arrow batch."""
    mixed = media.make_video_corpus(spark, 3).unionByName(
        media.make_real_video_corpus(spark, n=3, w=32, h=24)
    )
    rows = media.sample_frames(mixed, every_n=8).collect()
    vids = {r["video_id"] for r in rows}
    assert any(v.startswith("vid") for v in vids)
    assert any(v.startswith("rvid") for v in vids)
