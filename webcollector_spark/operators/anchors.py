"""Anchor-text aggregation over the discovered-link graph.

WebCollector extracts links (with their anchor elements in hand —
``model/Links.java:98-104`` ``addFromElement`` walks the ``a[href]``
elements whose ``.text()`` IS the anchor text) but throws the text away,
keeping only the URL string. At web scale the anchor text pointing AT a
page is one of the strongest labels the crawl itself produces: for an
image+caption corpus it supplies alt-text-grade caption candidates for
pages whose own markup has none, and it is a ranking feature on a par
with PageRank (it is what made early web search work).

Shape discipline for a 10^10-edge link graph:

* the per-(target, anchor) count is ONE hash aggregate — map-side
  combinable, output bounded by distinct (dst, anchor) pairs, which the
  normalization step (lower/trim/whitespace-collapse, all JVM regex)
  keeps far below the raw edge count on boilerplate-heavy sites;
* the per-target summary runs windows over the *aggregated* table
  (O(distinct anchors per page) rows per partition key, never raw
  edges), so a page with 10^7 inlinks but 40 distinct anchor strings
  costs a 40-row window;
* distinct-source counts use the same two-phase distinct the engine
  relies on everywhere — nothing is collected, nothing is broadcast.

The top anchor is chosen by (count DESC, anchor ASC) so the result is
bit-reproducible across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_anchor(col):
    """Lowercase, trim, collapse internal whitespace — the same
    canonicalization ladder as functions/urls.py, applied to anchor
    text so 'Click  HERE ' and 'click here' vote together."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def anchor_text_agg(links: DataFrame) -> DataFrame:
    """Per-target anchor-text profile from a (src, dst, anchor) edge
    table.

    Returns one row per dst:
      dst, inlinks (total edges), distinct_srcs, distinct_anchors,
      top_anchor (modal normalized anchor, count-desc/text-asc
      deterministic), top_anchor_cnt, top_share_pct (integer percent —
      no float division, so cross-engine hashing is exact).
    """
    e = links.select(
        F.col("src"),
        F.col("dst"),
        normalize_anchor(F.col("anchor")).alias("anchor"),
    ).filter(F.col("anchor") != "")

    # One map-side-combinable aggregate to (dst, anchor) grain.
    by_anchor = e.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))

    w = Window.partitionBy("dst").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    top = (
        by_anchor.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "distinct_anchors", F.count("*").over(Window.partitionBy("dst"))
        )
        .withColumn(
            "inlinks", F.sum("cnt").over(Window.partitionBy("dst"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "dst",
            "inlinks",
            "distinct_anchors",
            F.col("anchor").alias("top_anchor"),
            F.col("cnt").alias("top_anchor_cnt"),
            # integer percent: exact in both engines, no float ulp risk
            F.expr("cnt * 100 div inlinks").alias("top_share_pct"),
        )
    )

    # dst-level distinct sources: separate two-phase distinct keyed on
    # the SAME dst the window shuffled on (co-partitioned, cheap join).
    srcs = e.groupBy("dst").agg(
        F.countDistinct("src").alias("distinct_srcs")
    )
    return top.join(srcs, "dst").select(
        "dst",
        "inlinks",
        "distinct_srcs",
        "distinct_anchors",
        "top_anchor",
        "top_anchor_cnt",
        "top_share_pct",
    )


def caption_candidates_from_anchors(
    links: DataFrame, min_count: int = 2, max_per_dst: int = 3
) -> DataFrame:
    """Alt-text backfill: the top-k anchor strings per target page that
    at least ``min_count`` independent edges agree on — the caption
    candidates a curation pipeline falls back to when the page's own
    alt text is missing (caption_spam's NULL-group rows).

    Output is O(dst × max_per_dst); agreement is measured in distinct
    SOURCES not raw edges, so a single spammy page repeating one link
    10^6 times casts one vote.
    """
    e = links.select(
        "src", "dst", normalize_anchor(F.col("anchor")).alias("anchor")
    ).filter(F.col("anchor") != "")
    votes = e.groupBy("dst", "anchor").agg(
        F.countDistinct("src").alias("votes")
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("votes").desc(), F.col("anchor").asc()
    )
    return (
        votes.filter(F.col("votes") >= min_count)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_per_dst)
        .select("dst", "rank", "anchor", "votes")
    )
