"""Importance-ordered crawling: PageRank over the link graph observed so
far feeds the frontier `priority` column the per-host scheduler orders
by — the "partitioned priority queue" of the north star, with a
principled priority source instead of a constant.

Flow: two BFS discovery rounds (auto-parse) -> edges from the
fetched-history table (src page -> harvested link) -> 3 PageRank
iterations -> priorities_from_ranks -> force-inject the re-prioritized
rows -> the next generate schedules high-rank pages first.

    python examples/demo_pagerank_scheduling.py
"""

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from webcollector_spark import CrawlerConfig, fixtures
from webcollector_spark.crawler import BreadthCrawler
from webcollector_spark.operators.generate import generate_per_host
from webcollector_spark.operators.rank import pagerank, priorities_from_ranks
from webcollector_spark.session import get_spark
from webcollector_spark.sources.requester import SyntheticRequester


def main() -> None:
    spark = get_spark("demo-pagerank", cores=8, shuffle_partitions=8)
    corpus = fixtures.make_corpus(300)
    graph = fixtures.make_site_graph(300, n_hosts=6, out_degree=5)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))

    work = tempfile.mkdtemp(prefix="pr_demo_")
    history = f"{work}/fetched_history"
    crawler = BreadthCrawler(
        spark,
        req,
        crawl_path=f"{work}/crawldb",
        config=CrawlerConfig(top_n=80, fetched_history_path=history),
    )
    crawler.add_seed(fixtures.seeds_for(graph, 6))
    crawler.start(2)  # discovery rounds

    # link graph observed so far: fetching page -> harvested link
    hist = spark.read.parquet(history)
    edges = (
        hist.filter(F.col("links").isNotNull())
        .select(F.col("url").alias("src"), F.explode("links").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, iters=3)
    print(f"link graph: {edges.count()} edges, {ranks.count()} ranked nodes")

    # re-prioritize the frontier and persist via forced inject
    reprioritized = priorities_from_ranks(crawler.frontier(), ranks)
    crawler.store.inject(reprioritized, force=True)

    # next round's schedule now leads with the highest-rank pages
    nxt = generate_per_host(crawler.frontier(), k_per_host=5)
    print("next schedule (priority = -pagerank, most important first):")
    nxt.select("host", "url", F.round("priority", 5).alias("priority")).orderBy(
        "priority"
    ).show(10, truncate=False)

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
