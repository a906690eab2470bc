"""FLAC-subset codec (webcollector_spark.flac): lossless round trips,
checksum/corruption behavior, bitstream structure, honest
NotImplementedError boundaries, and the Spark dataflow vs the
committed pre-encode-PCM oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webcollector_spark import flac
from webcollector_spark.operators import media


def _smooth(n=9000, amp=3000):
    t = np.arange(n)
    return (amp * np.sin(t / 30) + amp / 3 * np.cos(t / 7)).astype(np.int16)


@pytest.mark.parametrize(
    "pcm",
    [
        _smooth(),
        np.full(5000, -123, np.int16),  # CONSTANT subframes
        np.zeros(10, np.int16),  # single tiny frame
        np.array([32767, -32768, 0, 1, -1] * 100, np.int16),  # extremes
    ],
    ids=["smooth", "constant", "tiny", "extremes"],
)
def test_mono_roundtrip_bit_exact(pcm):
    data = flac.encode_flac(pcm, 16000)
    out, sr = flac.decode_flac(data)
    assert sr == 16000 and out.dtype == np.int16
    assert np.array_equal(out, pcm)


def test_noise_roundtrip_uses_escape_or_high_k_and_stays_exact():
    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, 7000).astype(np.int16)
    data = flac.encode_flac(pcm, 8000)
    out, _ = flac.decode_flac(data)
    assert np.array_equal(out, pcm)


def test_stereo_roundtrip_and_compression_on_smooth_signal():
    left = _smooth(6000)
    right = (left // 2 + 77).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    data = flac.encode_flac(pcm, 44100)
    out, sr = flac.decode_flac(data)
    assert sr == 44100
    assert np.array_equal(out, pcm)
    # fixed predictors + Rice must actually compress a smooth signal
    assert len(data) < pcm.size * 2 * 0.8


def test_stream_structure_is_spec_shaped():
    pcm = _smooth(5000)
    data = flac.encode_flac(pcm, 16000)
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80  # last-metadata-block flag + STREAMINFO type
    assert int.from_bytes(data[5:8], "big") == 34  # STREAMINFO length
    # STREAMINFO carries rate/channels/bps/total
    packed = int.from_bytes(data[18:26], "big")
    assert packed >> 44 == 16000
    assert ((packed >> 41) & 0x7) + 1 == 1
    assert ((packed >> 36) & 0x1F) + 1 == 16
    assert packed & ((1 << 36) - 1) == 5000
    # first frame: 14-bit sync + fixed-blocksize strategy
    assert data[42] == 0xFF and data[43] == 0xF8
    # two frames for 5000 samples at blocksize 4096
    assert sum(1 for i in range(42, len(data) - 1)
               if data[i] == 0xFF and data[i + 1] == 0xF8) == 2


@pytest.mark.parametrize("n", [0, 5, 127, 128, 2047, 2048, 70000, 2**31])
def test_utf8_frame_number_roundtrip(n):
    enc = flac._utf8_number(n)
    br = flac._BitReader(enc)
    assert flac._read_utf8_number(br) == n
    if n < 128:
        assert len(enc) == 1


def test_corruption_in_audio_body_raises():
    data = bytearray(flac.encode_flac(_smooth(), 16000))
    data[len(data) // 2] ^= 0x40
    with pytest.raises((ValueError, NotImplementedError)):
        flac.decode_flac(bytes(data))


def test_corruption_in_frame_header_raises_crc8():
    data = bytearray(flac.encode_flac(_smooth(4000), 16000))
    # frame header starts at 42; flip a bit in the blocksize field
    data[47] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8"):
        flac.decode_flac(bytes(data))


def test_md5_mismatch_detected():
    data = bytearray(flac.encode_flac(_smooth(4000), 16000))
    data[26] ^= 0xFF  # corrupt the STREAMINFO MD5 itself
    with pytest.raises(ValueError, match="MD5"):
        flac.decode_flac(bytes(data))
    out, _ = flac.decode_flac(bytes(data), verify_md5=False)
    assert np.array_equal(out, _smooth(4000))


def test_truncated_stream_raises():
    data = flac.encode_flac(_smooth(), 16000)
    with pytest.raises(ValueError):
        flac.decode_flac(data[: len(data) - 7])


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.decode_flac(b"OggS" + b"\x00" * 50)


def test_unsupported_features_raise_not_implemented():
    data = bytearray(flac.encode_flac(np.zeros(100, np.int16), 16000))
    # bps=20 in STREAMINFO
    packed = int.from_bytes(data[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | (19 << 36)
    data[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(NotImplementedError, match="20-bit"):
        flac.decode_flac(bytes(data))


def test_rice_parameter_choice_is_cost_optimal():
    for k_true in (0, 3, 7, 11):
        u = np.full(256, (1 << k_true) + (1 << k_true) // 2, np.int64)
        k = flac._best_rice_k(u)
        cost = int(np.sum(u >> k)) + (k + 1) * len(u)
        for other in range(15):
            assert cost <= int(np.sum(u >> other)) + (other + 1) * len(u)


def test_metadata_cross_check_raises():
    r = media.flac_corpus_rows(1)[0]
    with pytest.raises(ValueError, match="metadata says"):
        media.decode_audio_flac(
            r["audio_id"], r["bytes"], r["n_samples"] + 1
        )


def test_spark_dataflow_matches_committed_oracle(spark):
    """audio_features over fmt='flac' rows must equal the committed
    PRE-ENCODE-PCM recompute — the decoder never runs on the oracle
    side, so agreement proves lossless decode, not shared bugs."""
    import pandas as pd

    got = (
        media.audio_features(media.make_flac_audio_corpus(spark, 16))
        .orderBy("audio_id")
        .toPandas()
    )
    exp = (
        pd.read_parquet("oracles/audio_features_flac.parquet")
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == 16
    assert (got["audio_id"].values == exp["audio_id"].values).all()
    assert np.allclose(got["rms"].values, exp["rms"].values)
    assert (got["zero_crossings"].values == exp["zero_crossings"].values).all()


def test_oracle_rebuild_is_stable():
    import sys
    from pathlib import Path

    import pandas as pd

    sys.path.insert(0, str(Path("tools").resolve()))
    from build_multimodal_oracles import build_audio_features_flac

    fresh = build_audio_features_flac(media.flac_corpus_rows(16))
    committed = pd.read_parquet("oracles/audio_features_flac.parquet")
    pd.testing.assert_frame_equal(
        fresh.sort_values("audio_id").reset_index(drop=True),
        committed.sort_values("audio_id").reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# LPC subframes (r5, VERDICT r4 item 6): quantized-coefficient integer
# prediction, orders 1-32 on decode, order-8 Levinson-Durbin on encode.


def _count_subframes(data):
    cnt = {"lpc": 0, "fixed": 0}
    rl, rf = flac._reconstruct_lpc, flac._reconstruct_fixed

    def spy_l(*a, **k):
        cnt["lpc"] += 1
        return rl(*a, **k)

    def spy_f(*a, **k):
        cnt["fixed"] += 1
        return rf(*a, **k)

    flac._reconstruct_lpc, flac._reconstruct_fixed = spy_l, spy_f
    try:
        flac.decode_flac(data)
    finally:
        flac._reconstruct_lpc, flac._reconstruct_fixed = rl, rf
    return cnt


def _resonant_pcm(n=8000, seed=1):
    rng = np.random.default_rng(seed)
    e = rng.normal(scale=200, size=n)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.81 * x[i - 2] + e[i]
    return np.clip(np.round(x), -32768, 32767).astype(np.int16)


def test_lpc_roundtrip_bit_exact_and_beats_fixed():
    """A resonant (AR-2) signal is what LPC exists for: the encoder
    must pick LPC subframes, the stream must decode bit-exactly, and
    the LPC stream must be smaller than a fixed-predictors-only one."""
    pcm = _resonant_pcm()
    enc = flac.encode_flac(pcm, 8000)
    dec, sr = flac.decode_flac(enc)
    assert np.array_equal(dec, pcm) and sr == 8000
    cnt = _count_subframes(enc)
    assert cnt["lpc"] > 0 and cnt["fixed"] == 0
    # disable the LPC candidate to get the fixed-only size
    orig = flac._lpc_quantize
    flac._lpc_quantize = lambda *a, **k: None
    try:
        enc_fixed = flac.encode_flac(pcm, 8000)
    finally:
        flac._lpc_quantize = orig
    assert np.array_equal(flac.decode_flac(enc_fixed)[0], pcm)
    assert _count_subframes(enc_fixed)["lpc"] == 0
    assert len(enc) < len(enc_fixed)


def test_corpus_contains_real_lpc_subframes():
    """The done-criterion: the audio_features_flac fixture must now
    exercise the LPC decode path (the predictor real encoders emit)."""
    tot = {"lpc": 0, "fixed": 0}
    for r in media.flac_corpus_rows(16):
        c = _count_subframes(r["bytes"])
        tot["lpc"] += c["lpc"]
        tot["fixed"] += c["fixed"]
    assert tot["lpc"] > 0 and tot["fixed"] > 0  # both families live


def test_lpc_decoder_handles_arbitrary_order_and_precision():
    """Hand-build an order-3, 10-bit-precision LPC subframe (shapes our
    encoder never emits) — third-party streams are not limited to
    order 8 / 12-bit."""
    order, prec, shift = 3, 10, 5
    qcoef = np.array([17, -9, 4], np.int64)
    rng = np.random.default_rng(3)
    x = np.empty(64, np.int64)
    x[:order] = [100, -50, 25]
    resid = rng.integers(-40, 40, size=64 - order).astype(np.int64)
    for i in range(order, 64):
        acc = sum(int(qcoef[j]) * int(x[i - 1 - j]) for j in range(order))
        x[i] = resid[i - order] + (acc >> shift)
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)
    bw.write(0, 1)
    for s in x[:order]:
        bw.write(int(s) & 0xFFFF, 16)
    bw.write(prec - 1, 4)
    bw.write(shift, 5)
    for c in qcoef:
        bw.write(int(c) & ((1 << prec) - 1), prec)
    flac._write_residual(bw, resid, 64, order)
    br = flac._BitReader(bw.flush() + b"\x00\x00")
    got = flac._read_subframe(br, 64)
    assert np.array_equal(got, x)


def test_negative_lpc_shift_refused():
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(32, 6)  # LPC order 1
    bw.write(0, 1)
    bw.write(0, 16)  # warmup
    bw.write(11, 4)  # precision 12
    bw.write(0x1F, 5)  # shift = -1 in 5-bit two's complement
    bw.write(1, 12)
    br = flac._BitReader(bw.flush() + b"\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="negative LPC shift"):
        flac._read_subframe(br, 4)


# ---------------------------------------------------------------------------
# Stereo decorrelation (r5): left/side, right/side, mid/side — the full
# spec channel-assignment set, side channel at bps+1.


def _correlated_stereo(n=9000, seed=5):
    rng = np.random.default_rng(seed)
    e = rng.normal(scale=150, size=n)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.5 * x[i - 1] - 0.7 * x[i - 2] + e[i]
    delta = rng.integers(-30, 30, size=n)
    L = np.clip(np.round(x), -30000, 30000).astype(np.int16)
    R = np.clip(np.round(x) + delta, -30000, 30000).astype(np.int16)
    return np.stack([L, R], axis=1)


def test_stereo_every_channel_assignment_roundtrips(monkeypatch):
    """Force each of the four spec channel assignments; every one must
    decode bit-exactly (8=left/side, 9=right/side, 10=mid/side carry a
    17-bit side channel; mid/side reconstructs via the side-low-bit
    trick). Also covers negative-side and odd-sum mid truncation via
    the +/-delta fixture."""
    pcm = _correlated_stereo()

    def force(code):
        def f(l, r):  # built from the FRAME's own block slices
            subs = {
                1: [(l, 16), (r, 16)],
                8: [(l, 16), (l - r, 17)],
                9: [(l - r, 17), (r, 16)],
                10: [((l + r) >> 1, 16), (l - r, 17)],
            }
            return code, subs[code]

        return f

    sizes = {}
    for code in (1, 8, 9, 10):
        monkeypatch.setattr(flac, "_pick_stereo_mode", force(code))
        enc = flac.encode_flac(pcm, 16000)
        got, sr = flac.decode_flac(enc)
        assert np.array_equal(got, pcm), f"chan_code {code}"
        sizes[code] = len(enc)
    # on a correlated signal every decorrelated mode beats independent
    assert all(sizes[c] < sizes[1] for c in (8, 9, 10)), sizes


def test_stereo_mode_choice_is_signal_appropriate():
    """The encoder's per-frame decision: correlated channels pick a
    side-carrying mode; independent noise keeps independent coding."""
    corr = _correlated_stereo()
    code, _ = flac._pick_stereo_mode(
        corr[:, 0].astype(np.int64), corr[:, 1].astype(np.int64)
    )
    assert code in (8, 9, 10)
    rng = np.random.default_rng(9)
    noise = rng.integers(-32768, 32767, size=(4096, 2)).astype(np.int64)
    code2, _ = flac._pick_stereo_mode(noise[:, 0], noise[:, 1])
    assert code2 == 1
    # end-to-end both ways
    assert np.array_equal(
        flac.decode_flac(flac.encode_flac(corr, 8000))[0], corr
    )
    n16 = noise.astype(np.int16)
    assert np.array_equal(
        flac.decode_flac(flac.encode_flac(n16, 8000))[0], n16
    )


def test_mid_side_truncation_edge_exact():
    """Odd L+R truncates mid; the side low bit must restore both
    channels exactly — pin the arithmetic on tiny hand values."""
    pcm = np.array(
        [[3, 2], [-3, 2], [1, -2], [-32768, 32767], [32767, -32768]],
        np.int16,
    )
    L = pcm[:, 0].astype(np.int64)
    R = pcm[:, 1].astype(np.int64)
    mid, side = (L + R) >> 1, L - R
    mid2 = (mid << 1) | (side & 1)
    assert np.array_equal((mid2 + side) >> 1, L)
    assert np.array_equal((mid2 - side) >> 1, R)


# ---------------------------------------------------------------------------
# Wasted bits (r5): shared low zero bits code at bps-k + unary k header.


def test_wasted_bits_roundtrip_and_reclaim_padding():
    """8-bit audio padded to 16 (every sample a multiple of 256) must
    round-trip exactly AND cost ~the same as the unpadded 8-bit-range
    encoding — the wasted-bits header reclaims the shift."""
    rng = np.random.default_rng(2)
    sm = np.cumsum(rng.integers(-3, 4, size=6000))
    pcm = ((rng.integers(-32, 31, size=6000) + sm) * 256).clip(
        -32768, 32512
    ).astype(np.int16)
    enc = flac.encode_flac(pcm, 8000)
    dec, sr = flac.decode_flac(enc)
    assert np.array_equal(dec, pcm)
    dense = flac.encode_flac(
        (pcm.astype(np.int64) // 256).astype(np.int16), 8000
    )
    assert len(enc) <= len(dense) + 64  # padding is fully reclaimed
    # stereo + decorrelation path with padding
    pcm2 = (rng.integers(-128, 127, size=(5000, 2)) * 256).astype(np.int16)
    assert np.array_equal(
        flac.decode_flac(flac.encode_flac(pcm2, 8000))[0], pcm2
    )


def test_wasted_bits_handcrafted_subframe():
    """Third-party shape: a CONSTANT subframe with k=3 wasted bits —
    value codes at 13 bits and shifts back by 3."""
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)  # CONSTANT
    bw.write(1, 1)  # wasted flag
    bw.write(1, 3)  # k-1 = 2 unary zeros then the 1 -> k = 3
    bw.write((-100) & 0x1FFF, 13)
    br = flac._BitReader(bw.flush() + b"\x00")
    got = flac._read_subframe(br, 5, 16)
    assert np.array_equal(got, np.full(5, -800, np.int64))


def test_wasted_bits_exceeding_width_refused():
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(1, 1)  # wasted flag
    bw.write(1, 16)  # k = 16 == bps: invalid
    bw.write(0, 8)
    br = flac._BitReader(bw.flush() + b"\x00\x00\x00")
    with pytest.raises(ValueError, match="wasted bits exceed"):
        flac._read_subframe(br, 4, 16)


# ---------------------------------------------------------------------------
# Variable blocksize (r5): strategy bit 1 + sample-number frame headers.


def test_variable_blocksize_roundtrip_and_header_shape():
    rng = np.random.default_rng(11)
    pcm = (
        np.cumsum(rng.integers(-50, 51, size=10000))
        .clip(-30000, 30000)
        .astype(np.int16)
    )
    enc = flac.encode_flac(pcm, 16000, block_sizes=[3000, 1500, 4096, 1404])
    dec, sr = flac.decode_flac(enc)
    assert np.array_equal(dec, pcm) and sr == 16000
    # STREAMINFO signals variable via min != max blocksize
    assert struct.unpack(">HH", enc[8:12]) == (1404, 4096)
    # first frame sync carries strategy bit 1 (0xFFF9)
    assert enc[42] == 0xFF and enc[43] == 0xF9
    # stereo + decorrelation under variable blocksize
    pcm2 = np.stack([pcm, (pcm // 2 + 9).astype(np.int16)], axis=1)
    enc2 = flac.encode_flac(pcm2, 16000, block_sizes=[5000, 5000])
    assert np.array_equal(flac.decode_flac(enc2)[0], pcm2)


def test_frame_number_coherence_enforced():
    """Splicing frames out of order must raise even though each frame's
    own CRC is intact — the coded number pins stream position."""
    pcm = _smooth(9000)  # three fixed-strategy frames
    data = flac.encode_flac(pcm, 16000)
    # find the three frame starts
    starts = [
        i
        for i in range(42, len(data) - 1)
        if data[i] == 0xFF and data[i + 1] == 0xF8
    ]
    assert len(starts) == 3
    spliced = (
        data[: starts[0]]
        + data[starts[1] : starts[2]]  # frame 1 first
        + data[starts[0] : starts[1]]  # then frame 0
        + data[starts[2] :]
    )
    with pytest.raises(ValueError, match="frame number|MD5"):
        flac.decode_flac(bytes(spliced))


# ---------------------------------------------------------------------------
# Partitioned Rice residuals (r5): cost-optimal partition order on
# encode; exercises the decoder's nparts>1 path with real output.


def _nonstationary_pcm(seed=3):
    rng = np.random.default_rng(seed)
    segs = []
    for i in range(8):  # alternate quiet/loud every 512 inside a block
        amp = 15 if i % 2 == 0 else 4000
        segs.append(rng.integers(-amp, amp + 1, size=512))
    return np.concatenate(segs).astype(np.int16)


def test_partitioned_rice_roundtrip_and_compression(monkeypatch):
    pcm = _nonstationary_pcm()
    enc = flac.encode_flac(pcm, 8000)
    assert np.array_equal(flac.decode_flac(enc)[0], pcm)
    monkeypatch.setattr(flac, "_MAX_PORDER", 0)
    enc0 = flac.encode_flac(pcm, 8000)
    assert np.array_equal(flac.decode_flac(enc0)[0], pcm)
    # a per-region Rice parameter must beat the single global one on a
    # quiet/loud alternating block — materially, not marginally
    assert len(enc) < 0.85 * len(enc0), (len(enc), len(enc0))


def test_partition_order_respects_spec_constraints(monkeypatch):
    """Blocksize not divisible by 2^porder (the short LAST frame) and
    first-partition-holds-warmup cases must still round-trip at every
    cap — the chooser may only pick legal orders."""
    rng = np.random.default_rng(7)
    for n in (4097, 4100, 5000, 777, 33):  # short/odd final frames
        pcm = (
            np.cumsum(rng.integers(-60, 61, size=n))
            .clip(-30000, 30000)
            .astype(np.int16)
        )
        for cap in (0, 3, 6):
            monkeypatch.setattr(flac, "_MAX_PORDER", cap)
            enc = flac.encode_flac(pcm, 8000)
            assert np.array_equal(flac.decode_flac(enc)[0], pcm), (n, cap)


def test_partitioned_with_lpc_stereo_and_wasted_bits():
    """All r5 features composed in one stream: stereo decorrelation,
    LPC subframes, wasted bits, partitioned residuals."""
    pcm_mono = _nonstationary_pcm(9).astype(np.int64)
    L = (pcm_mono * 4).clip(-32768, 32767) & ~1  # one shared low zero bit
    R = (L + np.arange(len(L)) % 7 * 2 - 6).clip(-32768, 32767)
    pcm = np.stack([L, R], axis=1).astype(np.int16)
    enc = flac.encode_flac(pcm, 16000)
    assert np.array_equal(flac.decode_flac(enc)[0], pcm)
