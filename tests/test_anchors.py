"""Anchor-text aggregation: normalization folds casing/whitespace
variants together, the modal anchor is deterministic under ties, and
caption candidates vote by distinct source (not raw edge count)."""

from __future__ import annotations

from webcollector_spark.operators.anchors import (
    anchor_text_agg,
    caption_candidates_from_anchors,
)


def _links(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, anchor string")


def test_anchor_profile_normalizes_and_picks_modal(spark):
    rows = [
        # 3 votes for "red shoes" across case/space variants, 2 for "buy"
        ("a", "p1", "Red  Shoes"),
        ("b", "p1", " red shoes "),
        ("c", "p1", "RED SHOES"),
        ("a", "p1", "buy"),
        ("d", "p1", "buy"),
        # empty-after-normalize anchor is dropped
        ("e", "p1", "   "),
        # second target: tie on count -> lexicographically first anchor
        ("a", "p2", "beta"),
        ("b", "p2", "alpha"),
    ]
    out = {r.dst: r for r in anchor_text_agg(_links(spark, rows)).collect()}

    p1 = out["p1"]
    assert p1.top_anchor == "red shoes"
    assert p1.top_anchor_cnt == 3
    assert p1.inlinks == 5
    assert p1.distinct_anchors == 2
    assert p1.distinct_srcs == 4  # a b c d (e dropped with its blank anchor)
    assert p1.top_share_pct == 60

    p2 = out["p2"]
    assert p2.top_anchor == "alpha"  # count tie broken by anchor ASC
    assert p2.top_anchor_cnt == 1


def test_caption_candidates_vote_by_distinct_source(spark):
    rows = [
        # one spammy src repeats the same anchor 5 times: 1 vote
        *[("spam", "p1", "cheap pills")] * 5,
        # two independent sources agree on "holiday photo": 2 votes
        ("a", "p1", "Holiday Photo"),
        ("b", "p1", "holiday  photo"),
        # single-source anchor: below min_count
        ("c", "p1", "misc"),
    ]
    got = caption_candidates_from_anchors(
        _links(spark, rows), min_count=2, max_per_dst=3
    ).collect()
    assert [(r.dst, r.rank, r.anchor, r.votes) for r in got] == [
        ("p1", 1, "holiday photo", 2)
    ]


def test_max_per_dst_truncates(spark):
    rows = []
    for i in range(5):  # 5 anchors, each with descending distinct-src votes
        for s in range(6 - i):
            rows.append((f"s{i}-{s}", "p1", f"anchor{i}"))
    got = caption_candidates_from_anchors(
        _links(spark, rows), min_count=2, max_per_dst=3
    ).collect()
    assert [r.anchor for r in got] == ["anchor0", "anchor1", "anchor2"]
    assert [r.votes for r in got] == [6, 5, 4]
