"""Visitor-routing demo — the reference's annotation-dispatch pattern
(example/DemoBingCrawler.java: typed seeds, meta plumbing, redirect
re-add, per-level depth meta) on the PySpark engine.

    python examples/demo_visitor_routing.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from webcollector_spark import CrawlDatums, Page, Visitor, fixtures
from webcollector_spark.operators.dispatch import match_code, match_type
from webcollector_spark.sources.requester import SyntheticRequester


class ListThenItem(Visitor):
    """Typed two-stage crawl: 'list' pages emit 'item' tasks carrying
    meta (the DemoBingCrawler shape, key != url pagination pattern)."""

    def __init__(self):
        self.items: list[str] = []

    @match_code(301, 302)
    def on_redirect(self, page: Page, nxt: CrawlDatums) -> None:
        # reference pattern (DemoRedirectCrawler.java:52-63): re-add the
        # recorded Location manually, carrying the original meta
        if page.location:
            nxt.add_and_return(page.location).meta(dict(page.meta))

    @match_type("list")
    def on_list(self, page: Page, nxt: CrawlDatums) -> None:
        for i, link in enumerate(page.links("a")[:3]):
            added = nxt.add_and_return(link)
            added.type("item").meta("rank", i).meta("from", page.url)

    @match_type("item")
    def on_item(self, page: Page, nxt: CrawlDatums) -> None:
        cap = page.select_text("p.caption")
        self.items.append(f"{page.url} rank={page.meta.get('rank')} cap={cap!r}")

    def visit(self, page: Page, nxt: CrawlDatums) -> None:
        pass  # untyped pages ignored


def main() -> None:
    from pyspark.sql import functions as F

    from webcollector_spark import CrawlerConfig, RamCrawler
    from webcollector_spark.datum import CrawlDatum
    from webcollector_spark.session import get_spark

    corpus = fixtures.make_corpus(40)
    graph = fixtures.make_site_graph(40, n_hosts=4, out_degree=3)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))

    # The visitor now runs INSIDE the crawl loop: handlers execute in the
    # fetch stage's Arrow batches, their emitted datums (typed, meta-
    # carrying) merge as the round's link segment.
    spark = get_spark("demo-visitor", cores=4, shuffle_partitions=4)
    crawler = RamCrawler(
        spark, req, config=CrawlerConfig(bloom_capacity=10_000),
        visitor=ListThenItem(),
    )
    crawler.add_seed(
        [CrawlDatum(u).type("list") for u in fixtures.seeds_for(graph, 2)]
    )
    for m in crawler.start(2):
        print(m)

    items = (
        crawler.frontier()
        .filter(F.col("meta")["s_t"] == "item")
        .select("url", F.col("meta")["rank"].alias("rank"), "status")
        .orderBy("rank", "url")
    )
    print(f"collected {items.count()} item tasks:")
    for r in items.limit(5).collect():
        print(f"  {r.url} rank={r.rank} status={r.status}")


if __name__ == "__main__":
    main()
