"""Visitor wired through the crawl loop (VERDICT r01 gap #1).

Ports the reference's flagship usage — a crawler driven by a Visitor
whose handlers emit the next-links (example/DemoBingCrawler.java:55-135:
typed seeds with meta, redirect re-add with copyMeta, per-level meta
broadcast, key!=url outlink datums) — end-to-end through
BreadthCrawler.start(), and checks the engine against the single-process
OracleCrawler running the SAME VisitorDispatcher. Dispatch precedence
inside the loop (code -> type -> default) follows
VisitorMethodDispatcher.java:199-230.
"""

from urllib.parse import urljoin

import pytest

from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.datum import CrawlDatum
from webcollector_spark.operators.dispatch import Visitor, match_code
from webcollector_spark.oracle import OracleCrawler
from webcollector_spark.sources.requester import SyntheticRequester

SE = "http://se.test"


def _page(url, out_links=(), code=200, location=None):
    return {
        "url": url,
        "http_code": code,
        "location": location,
        "image_id": None,
        "out_links": list(out_links),
    }


def _search_web():
    """A tiny deterministic 'search engine': page 1 lists three results,
    page 2's canonical URL 302-redirects (relative Location) to the real
    page which lists two more; result sites are plain leaf pages."""
    results1 = [f"http://site{i}.test/doc" for i in (1, 2, 3)]
    results2 = [f"http://site{i}.test/doc" for i in (4, 5)]
    rows = [
        _page(f"{SE}/search?q=kw&first=1", results1),
        _page(
            f"{SE}/search?q=kw&first=11",
            code=302,
            location="search2?q=kw&first=11",  # relative, like Bing's
        ),
        _page(f"{SE}/search2?q=kw&first=11", results2),
    ]
    rows += [_page(u) for u in results1 + results2]
    return rows


def _make_visitor():
    """Defined inside a function so cloudpickle ships the class by value
    to the Python workers (test modules aren't importable there)."""

    class BingVisitor(Visitor):
        @match_code(301, 302)
        def on_redirect(self, page, next):  # noqa: A002
            # DemoBingCrawler.java:74-85 — resolve relative Location,
            # re-add with copied meta
            redirect = urljoin(page.url, page.location)
            next.add_and_return(redirect).meta(page.copy_meta())

        def visit(self, page, next):  # noqa: A002
            keyword = page.meta.get("keyword")
            page_index = int(page.meta["pageIndex"])
            depth = int(page.meta["depth"])
            if page.match_type("searchEngine"):
                for rank, href in enumerate(page.links("a")):
                    next.add_and_return(href).type("outlink").meta(
                        "keyword", keyword
                    ).meta("pageIndex", page_index).meta("rank", rank)
            # per-level meta broadcast to EVERY emitted datum
            # (DemoBingCrawler.java:134: depth+1 + referer)
            next.meta("depth", depth + 1).meta("referer", page.url)

    return BingVisitor()


def _seeds():
    out = []
    for page_index, url in enumerate(
        [f"{SE}/search?q=kw&first=1", f"{SE}/search?q=kw&first=11"], start=1
    ):
        out.append(
            CrawlDatum(url)
            .type("searchEngine")
            .meta("keyword", "kw")
            .meta("pageIndex", page_index)
            .meta("depth", 1)
        )
    return out


def _engine_state(crawler):
    rows = crawler.frontier().collect()
    return {r.key: (r.status, r.execute_count, r.code) for r in rows}


def _engine_metas(crawler):
    return {
        r.key: (dict(r.meta) if r.meta else None)
        for r in crawler.frontier().collect()
    }


def test_demo_bing_visitor_port(spark):
    rows = _search_web()
    oracle = OracleCrawler(
        SyntheticRequester(rows, []), visitor=_make_visitor()
    )
    oracle.inject(_seeds())
    oracle.start(3)

    crawler = RamCrawler(
        spark,
        SyntheticRequester(rows, []),
        config=CrawlerConfig(bloom_capacity=10_000),
        visitor=_make_visitor(),
    )
    crawler.add_seed(_seeds())
    crawler.start(3)

    assert _engine_state(crawler) == oracle.state()
    assert _engine_metas(crawler) == oracle.metas()

    metas = _engine_metas(crawler)
    state = _engine_state(crawler)

    # redirect re-added with copied meta, then crawled as searchEngine
    redirected = f"{SE}/search2?q=kw&first=11"
    assert state[redirected][0] == 5
    assert metas[redirected]["s_t"] == "searchEngine"
    assert metas[redirected]["pageIndex"] == "2"

    # outlinks carry type/keyword/pageIndex/rank + broadcast depth/referer
    doc1 = "http://site1.test/doc"
    assert state[doc1][0] == 5
    m = metas[doc1]
    assert m["s_t"] == "outlink" and m["keyword"] == "kw"
    assert m["pageIndex"] == "1" and m["rank"] == "0"
    assert m["depth"] == "2" and m["referer"] == f"{SE}/search?q=kw&first=1"
    # page-2 outlinks rank from the redirected page
    m4 = metas["http://site4.test/doc"]
    assert m4["pageIndex"] == "2" and m4["referer"] == redirected

    # all five result docs fetched (BFS through the visitor)
    assert all(
        state[f"http://site{i}.test/doc"][0] == 5 for i in (1, 2, 3, 4, 5)
    )


def test_visitor_autoparse_harvest_in_loop(spark, small_web):
    """Base Visitor + regex rule: parseLink harvesting runs inside the
    loop (contentType-gated) and matches the oracle in visitor mode —
    pins that auto-parse and visitor emission compose, and that
    redirects are NOT auto-followed in visitor mode."""
    from webcollector_spark import fixtures

    graph, corpus = small_web
    seeds = fixtures.seeds_for(graph, 3)

    def req():
        return SyntheticRequester(
            graph.to_dict("records"), corpus.to_dict("records")
        )

    cfg = CrawlerConfig(bloom_capacity=10_000, regex_rules=["+http://.*"])
    oracle = OracleCrawler(
        req(), regex_rules=["+http://.*"], visitor=Visitor()
    )
    oracle.inject(seeds)
    oracle.start(3)

    crawler = RamCrawler(spark, req(), config=cfg, visitor=Visitor())
    crawler.add_seed(list(seeds))
    crawler.start(3)
    assert _engine_state(crawler) == oracle.state()


def test_visitor_next_filter(spark):
    """cfg.next_filter applies to visitor-emitted datums per (next,
    referer) — Fetcher.java:246-255."""
    rows = _search_web()

    def drop_site2(url, referer):
        # local def -> cloudpickle ships it by value inside the UDF closure
        return None if "site2" in url else url

    cfg = CrawlerConfig(bloom_capacity=10_000, next_filter=drop_site2)
    crawler = RamCrawler(
        spark, SyntheticRequester(rows, []), config=cfg, visitor=_make_visitor()
    )
    crawler.add_seed(_seeds())
    crawler.start(2)
    keys = {r.key for r in crawler.frontier().collect()}
    assert "http://site1.test/doc" in keys
    assert "http://site2.test/doc" not in keys


def test_duplicate_emission_meta_deterministic(spark):
    """Two parents at the same depth emit the same outlink with
    different meta (rank/referer): the merged row must pick the same
    winner on every run and backend — the (depth, url, canonical-meta)
    policy shared by the engine windows and the oracle."""
    shared = "http://site9.test/doc"
    rows = [
        _page(f"{SE}/search?q=kw&first=1", [shared, "http://site1.test/doc"]),
        _page(f"{SE}/search?q=kw&first=21", [shared]),
        _page(shared),
        _page("http://site1.test/doc"),
    ]
    seeds = [
        CrawlDatum(f"{SE}/search?q=kw&first=1").type("searchEngine")
        .meta("keyword", "kw").meta("pageIndex", 1).meta("depth", 1),
        CrawlDatum(f"{SE}/search?q=kw&first=21").type("searchEngine")
        .meta("keyword", "kw").meta("pageIndex", 3).meta("depth", 1),
    ]

    def run_engine():
        crawler = RamCrawler(
            spark, SyntheticRequester(rows, []),
            config=CrawlerConfig(bloom_capacity=10_000),
            visitor=_make_visitor(),
        )
        crawler.add_seed(list(seeds))
        crawler.start(2)
        return _engine_metas(crawler)[shared]

    oracle = OracleCrawler(SyntheticRequester(rows, []), visitor=_make_visitor())
    oracle.inject(list(seeds))
    oracle.start(2)
    want = oracle.metas()[shared]

    first = run_engine()
    second = run_engine()
    assert first == second == want
    # the policy picks the minimal canonical meta among the tied rows:
    # both parents emitted rank 0, pageIndex differs (1 vs 3)
    assert first["rank"] == "0" and first["pageIndex"] in ("1", "3")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
