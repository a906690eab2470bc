"""Breadth crawl demo — the reference's flagship usage
(example/DemoAutoNewsCrawler.java / plugin/rocks/BreadthCrawler shape):
seed + regex rules + depth-bounded BFS, persistent crawl path, resume.

Runs against the deterministic synthetic web (no network):
    python examples/demo_breadth_crawler.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from webcollector_spark import BreadthCrawler, CrawlerConfig, fixtures
from webcollector_spark.session import get_spark
from webcollector_spark.sinks import describe_frontier
from webcollector_spark.sources.requester import SyntheticRequester


def main() -> None:
    spark = get_spark("demo-breadth", cores=8, shuffle_partitions=8)
    corpus = fixtures.make_corpus(200)
    graph = fixtures.make_site_graph(200, n_hosts=8, out_degree=4)
    requester = SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records")
    )

    crawler = BreadthCrawler(
        spark,
        requester,
        crawl_path="/tmp/demo_crawl",
        config=CrawlerConfig(
            top_n=100,                # per-round budget (Config.TOP_N)
            per_host_top_k=20,        # graft: skew-safe per-host cap
            per_host_rate=50.0,       # politeness: 50 fetches/s/host
            max_execute_count=3,      # retry budget
        ),
    )
    crawler.add_seed(fixtures.seeds_for(graph, 4))
    crawler.add_regex("+http://h0.*")   # RegexRule: positive prefix
    crawler.add_regex("-.*dead.*")      # ...negative

    for m in crawler.start(4):
        print(
            f"round {m.round}: generated={m.generated} fetched={m.fetched} "
            f"failed={m.failed} new_links={m.new_links} wall={m.wall_ms}ms"
        )

    print(describe_frontier(crawler.frontier(), n=3))
    crawler.frontier().groupBy("status").count().show()


if __name__ == "__main__":
    main()
