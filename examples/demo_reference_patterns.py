"""Ports of the remaining reference example patterns, consolidated:

* key != url tasks — the POST/pagination pattern (DemoPostCrawler.java:
  same URL crawled as several distinct tasks, identity = key; request
  params ride meta)
* depth-bounded crawl via meta (DemoAnnotatedDepthCrawler.java:58-70)
* NextFilter drop/rewrite per (link, referer) (DemoNextFilter.java,
  DemoHashSetNextFilter.java)
* cookie / UA requester config (DemoCookieCrawler.java)

    python examples/demo_reference_patterns.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from webcollector_spark import CrawlerConfig, RamCrawler, Visitor, fixtures
from webcollector_spark.datum import CrawlDatum
from webcollector_spark.operators.dispatch import match_type
from webcollector_spark.session import get_spark
from webcollector_spark.sources.requester import HttpRequester, SyntheticRequester


class PostStyleVisitor(Visitor):
    """DemoPostCrawler shape: one endpoint URL, N tasks distinguished by
    key; the 'request body' lives in meta. Each page-task emits the next
    page-task until max_page, bounded by a depth meta."""

    @match_type("page")
    def on_page(self, page, nxt):
        page_no = int(page.meta["page"])
        depth = int(page.meta["depth"])
        if depth >= 4 or page_no >= 4:
            return
        # same URL, new key -> a distinct crawl task (CrawlDatum.java:54-59)
        nxt.add_and_return(CrawlDatum(page.url).key(f"{page.url}#page{page_no + 1}")) \
            .type("page").meta("page", page_no + 1).meta("depth", depth + 1)

    def visit(self, page, nxt):
        pass


def main() -> None:
    spark = get_spark("demo-patterns", cores=4, shuffle_partitions=4)
    corpus = fixtures.make_corpus(30)
    graph = fixtures.make_site_graph(30, n_hosts=3, out_degree=3)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    endpoint = graph["url"].iloc[0]

    # --- key != url pagination through the visitor loop ---------------
    crawler = RamCrawler(
        spark, req, config=CrawlerConfig(bloom_capacity=10_000),
        visitor=PostStyleVisitor(),
    )
    crawler.add_seed(
        [CrawlDatum(endpoint).key(f"{endpoint}#page1").type("page")
         .meta("page", 1).meta("depth", 1)]
    )
    crawler.start(5)
    tasks = crawler.frontier().orderBy("key")
    print("pagination tasks (one URL, four keys):")
    for r in tasks.select("key", "status", F.col("meta")["page"].alias("p")).collect():
        print(f"  {r.key}  status={r.status} page={r.p}")

    # --- NextFilter: drop cross-host links, rewrite tracking params ----
    def next_filter(url, referer):
        if referer and url.split("/")[2] != referer.split("/")[2]:
            return None  # stay on-host (DemoHashSetNextFilter boundary)
        return url.split("?utm_")[0]  # canonicalize

    nf_crawler = RamCrawler(
        spark, req,
        config=CrawlerConfig(bloom_capacity=10_000, next_filter=next_filter),
    )
    nf_crawler.add_seed([endpoint])
    nf_crawler.start(2)
    hosts = {r.host for r in nf_crawler.frontier().select("host").distinct().collect()}
    print(f"next_filter kept the crawl on {hosts} (cross-host links dropped)")

    # --- cookie/UA config rides into the production requester ----------
    http = HttpRequester(
        user_agent="Mozilla/5.0 (webcollector-spark demo)",
        cookie="session=abc123",  # DemoCookieCrawler.java pattern
        proxies=["http://proxy.example:3128"],
    )
    print(
        "HttpRequester configured:",
        {"ua": http.user_agent, "cookie": http.cookie, "proxies": list(http.proxies)},
    )


if __name__ == "__main__":
    main()
