"""End-to-end graft story: crawl -> fetch+decode image payloads ->
offline fetched-history table -> caption curation. The synthetic web
serves the NOISY corpus (fixtures.corpus_with_caption_noise), so the
curation operators must surface the planted label pathologies from
rows the crawl loop itself produced — not from a hand-built corpus.

Identity note: boilerplate captions ("image", "") defeat the
caption-convention image_id extraction on purpose, so curation keys on
the crawl's own identity (`key` = URL), exactly what a production
pipeline would do."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators import captions
from webcollector_spark.sources.requester import SyntheticRequester


def _noisy_web(n=60, dupes=12):
    """One page per noisy-corpus row (dup rows included), all 200s with
    no out-links: injecting every URL as a seed makes round 1 fetch the
    whole web, so the history is exactly the corpus — no reachability
    luck involved."""
    corpus = fixtures.corpus_with_caption_noise(n, dupes)
    rows = [
        {
            "url": f"http://h{i % 5:03d}.test/p/{i}",
            "host": f"h{i % 5:03d}.test",
            "image_id": image_id,
            "out_links": [],
            "http_code": 200,
            "location": None,
        }
        for i, image_id in enumerate(corpus["image_id"])
    ]
    return pd.DataFrame(rows), corpus


def test_crawl_then_caption_curation(spark, tmp_path):
    graph, corpus = _noisy_web()
    hist = str(tmp_path / "fetched_history")
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    crawler = RamCrawler(
        spark,
        req,
        config=CrawlerConfig(
            top_n=0, bloom_capacity=10_000, fetched_history_path=hist
        ),
    )
    crawler.add_seed(sorted(graph["url"].tolist()))
    metrics = crawler.start(1)
    assert metrics[0].fetched == len(graph)

    fetched = (
        spark.read.parquet(hist)
        .filter(F.col("phash").isNotNull())
        .select(F.col("key").alias("image_id"), "phash", "caption")
    )
    assert fetched.count() == len(graph)

    # boilerplate spam: "image" (every 13th source row) labels many
    # distinct crawled pictures; the empty-caption rows (every 17th,
    # offset 3) serve NO <p class=caption> at all, so the crawl records
    # caption NULL — the missing-alt-text group — and the detector must
    # flag that group too (NULLs aggregate to one group in Spark and
    # DuckDB alike)
    spam = {
        r["caption_norm"]: r
        for r in captions.caption_spam(fetched, min_phashes=3).collect()
    }
    assert "image" in spam and spam["image"]["n_phashes"] >= 3
    assert None in spam

    # label conflict: the crawl fetched both img_i and its lossy dup;
    # odd dup indices carry a fresh "alternate view" caption -> a
    # near-identical pixel pair (phash hamming <= 4) with disagreeing
    # labels must surface from crawled rows
    conflicts = captions.caption_conflict(fetched, max_hamming=4).collect()
    assert conflicts
    assert all(r["hamming"] <= 4 and r["cap_a"] != r["cap_b"] for r in conflicts)
    assert any("alternate view" in (r["cap_a"] + r["cap_b"]) for r in conflicts)

    # dedup bookkeeping is complete: every crawled row lands in exactly
    # one normalized-caption group
    total = (
        captions.caption_dedup(fetched).agg(F.sum("n_images")).collect()[0][0]
    )
    assert total == len(graph)
