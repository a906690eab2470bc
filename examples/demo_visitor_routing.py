"""Visitor-routing demo — the reference's annotation-dispatch pattern
(example/DemoBingCrawler.java: typed seeds, meta plumbing, redirect
re-add, per-level depth meta) on the PySpark engine.

    python examples/demo_visitor_routing.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from webcollector_spark import CrawlDatums, Page, Visitor, fixtures
from webcollector_spark.operators.dispatch import (
    VisitorDispatcher,
    match_code,
    match_type,
)
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
    corpus = fixtures.make_corpus(40)
    graph = fixtures.make_site_graph(40, n_hosts=4, out_degree=3)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))

    visitor = ListThenItem()
    dispatcher = VisitorDispatcher(visitor)

    # drive two levels by hand (driver-side; at scale this runs inside
    # the fetch stage via operators.dispatch.visit_fetched)
    level = CrawlDatums().add(fixtures.seeds_for(graph, 2)).type("list")
    for _ in range(2):
        nxt = CrawlDatums()
        for datum in level:
            resp = req.fetch(datum.url())
            page = Page(
                url=datum.url(), code=resp.code, content=resp.content,
                content_type=resp.content_type, meta=datum.meta(),
                location=resp.location,
            )
            dispatcher.dispatch(page, nxt)
        level = nxt

    print(f"collected {len(visitor.items)} items:")
    for line in visitor.items[:5]:
        print(" ", line)


if __name__ == "__main__":
    main()
