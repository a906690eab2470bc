"""Soft-404 detection: modal-fingerprint profile, threshold verdicts,
null handling, and the broadcast anti-join consumer."""

from __future__ import annotations

from webcollector_spark.operators.traps import soft404_filter, soft404_hosts


def _log(spark, rows):
    return spark.createDataFrame(rows, "host string, key string, phash long")


def test_soft404_verdicts_and_nulls(spark):
    rows = []
    # parked host: 8 copies of fp=111, 2 real pages, 2 undecodable
    rows += [("parked", f"p{i}", 111) for i in range(8)]
    rows += [("parked", "r1", 5), ("parked", "r2", 6)]
    rows += [("parked", "x1", None), ("parked", "x2", None)]
    # healthy host: 10 distinct fingerprints
    rows += [("healthy", f"h{i}", 1000 + i) for i in range(10)]
    # small host: 3 identical pages — 100% share but below min_pages
    rows += [("small", f"s{i}", 42) for i in range(3)]
    got = {
        r.host: r
        for r in soft404_hosts(
            _log(spark, rows), min_pages=5, min_share_pct=60
        ).collect()
    }

    p = got["parked"]
    assert p.is_soft404
    assert (p.modal_fp, p.modal_pages, p.total_pages) == (111, 8, 10)
    assert p.share_pct == 80  # nulls excluded from the denominator
    assert not got["healthy"].is_soft404
    assert not got["small"].is_soft404  # share 100 but only 3 pages

    kept = soft404_filter(
        _log(spark, rows), soft404_hosts(_log(spark, rows), 5, 60)
    ).collect()
    kept_keys = {r.key for r in kept}
    # the 8 modal copies drop; real, undecodable, and other hosts stay
    assert not {f"p{i}" for i in range(8)} & kept_keys
    assert {"r1", "r2", "x1", "x2"} <= kept_keys
    assert {f"h{i}" for i in range(10)} <= kept_keys
    assert {f"s{i}" for i in range(3)} <= kept_keys


def test_modal_tiebreak_deterministic(spark):
    rows = [("h", "a", 2), ("h", "b", 2), ("h", "c", 1), ("h", "d", 1)]
    got = soft404_hosts(_log(spark, rows), 1, 0).collect()
    assert len(got) == 1
    assert got[0].modal_fp == 1  # count tie (2=2) broken by fp ASC

    below = soft404_hosts(_log(spark, rows), 1, 51).collect()[0]
    assert not below.is_soft404  # share is exactly 50 (2*100 div 4)
    at = soft404_hosts(_log(spark, rows), 2, 50).collect()[0]
    assert at.is_soft404  # inclusive thresholds
