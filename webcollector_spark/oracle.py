"""Single-process replay oracle of the reference crawl loop.

A faithful, tiny reimplementation of WebCollector's BreadthCrawler round
semantics (crawler/Crawler.java:91-149 + crawldb/Generator.java:49-78 +
fetcher/Fetcher.java:237-281 + RocksDBManager merge :160-197), used as
the golden model in replay-equivalence tests: the Spark engine must
produce the same per-round generated key sequence (sorted-key mode), the
same final visited set, and the same statuses/execute_counts on the same
deterministic site graph.

Shares the HTML extraction + RegexRule + requester code with the engine,
so what the equivalence tests actually pin down is the *dataflow*
semantics: generate ordering, topN truncation, strict-`>` retry
boundary, merge conflict rules, seen-filter correctness.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from webcollector_spark.functions import html as H
from webcollector_spark.functions.charset import decode_html
from webcollector_spark.functions.regex_rule import RegexRule
from webcollector_spark.schema import (
    CODE_NOT_SET,
    STATUS_DB_FAILED,
    STATUS_DB_SUCCESS,
    STATUS_DB_UNEXECUTED,
    host_of,
)
from webcollector_spark.sources.requester import SUCCESS_CODES, Requester, RobotsCache


@dataclass
class OracleDatum:
    key: str
    url: str
    status: int = STATUS_DB_UNEXECUTED
    execute_count: int = 0
    code: int = CODE_NOT_SET
    location: str | None = None
    depth: int = 0
    meta: dict | None = None


def _meta_canon(meta: dict | None) -> str:
    """Spark to_json of the key-sorted meta map (compact separators) —
    the engine's deterministic link tiebreak (store._meta_order)."""
    import json

    if not meta:
        return ""
    return json.dumps(dict(sorted(meta.items())), separators=(",", ":"))


def _link_keep(seg: dict, cand: "OracleDatum") -> None:
    """Within-round link dedup, engine policy: keep the minimum of
    (depth asc, url asc, canonical meta asc) per key — NOT emission
    order, so the oracle and every Spark backend agree even when the
    same key is emitted by several parents at different depths or with
    different meta."""
    prev = seg.get(cand.key)
    if prev is None or (
        (cand.depth, cand.url, _meta_canon(cand.meta))
        < (prev.depth, prev.url, _meta_canon(prev.meta))
    ):
        seg[cand.key] = cand


@dataclass
class OracleCrawler:
    requester: Requester
    top_n: int = 0
    max_execute_count: int = 10
    regex_rules: list[str] = field(default_factory=list)
    auto_parse: bool = True
    robots: bool = False
    # graft scheduler mode: per-host top-k by (priority, depth, key) —
    # the single-process model of operators/generate.generate_per_host
    # (0 = reference-exact global sorted-key mode)
    per_host_top_k: int = 0
    # Visitor mode (AutoParseCrawler.java:52-57): handlers drive link
    # emission through the same VisitorDispatcher class the engine ships
    # to executors — what the equivalence test pins is the round-loop
    # plumbing of emitted datums, not the dispatcher itself.
    visitor: object | None = None

    def __post_init__(self):
        self.db: dict[str, OracleDatum] = {}
        self.generated_per_round: list[list[str]] = []
        self._rule = RegexRule(self.regex_rules)
        self._robots = RobotsCache(self.requester) if self.robots else None
        self._dispatcher = None
        if self.visitor is not None:
            from webcollector_spark.operators.dispatch import VisitorDispatcher

            self._dispatcher = VisitorDispatcher(
                self.visitor, auto_parse=self.auto_parse, regex_rule=self._rule
            )

    def inject(self, seeds: list, force: bool = False) -> None:
        """Seeds: URL strings or CrawlDatum objects (typed/meta seeds —
        the DemoBingCrawler pattern)."""
        from webcollector_spark.datum import CrawlDatum

        for s in seeds:
            if isinstance(s, CrawlDatum):
                k = s.key()
                if force or k not in self.db:
                    self.db[k] = OracleDatum(
                        key=k, url=s.url(), meta=(dict(s.meta_data) or None)
                    )
            elif force or s not in self.db:
                self.db[s] = OracleDatum(key=s, url=s)

    def start(self, depth: int) -> None:
        for _ in range(depth):
            generated = self._generate()
            if not generated:
                break
            self.generated_per_round.append([d.key for d in generated])
            fetch_seg: dict[str, OracleDatum] = {}
            link_seg: dict[str, OracleDatum] = {}
            for d in generated:
                self._execute(d, fetch_seg, link_seg)
            # merge: fetch overwrite (RocksDBManager.java:167-171),
            # link insert-if-absent (:176-183)
            for k, v in fetch_seg.items():
                self.db[k] = v
            for k, v in link_seg.items():
                if k not in self.db:
                    self.db[k] = v

    def _generate(self) -> list[OracleDatum]:
        if self.per_host_top_k:
            return self._generate_per_host()
        out = []
        for k in sorted(self.db):  # key-lexicographic cursor
            d = self.db[k]
            if d.status == STATUS_DB_SUCCESS:
                continue
            if d.execute_count > self.max_execute_count:  # strict >
                continue
            out.append(d)
            if self.top_n and len(out) >= self.top_n:
                break
        return out

    def _generate_per_host(self) -> list[OracleDatum]:
        """Per-host top-k by (depth, key) (priority is 0 throughout the
        BFS path), then optional global top_n by the same order —
        mirrors generate_per_host exactly."""
        by_host: dict[str, list[OracleDatum]] = {}
        for k in sorted(self.db):
            d = self.db[k]
            if d.status == STATUS_DB_SUCCESS:
                continue
            if d.execute_count > self.max_execute_count:
                continue
            by_host.setdefault(host_of(d.url), []).append(d)
        out: list[OracleDatum] = []
        for host in by_host:
            ranked = sorted(by_host[host], key=lambda d: (d.depth, d.key))
            out.extend(ranked[: self.per_host_top_k])
        out.sort(key=lambda d: (d.depth, d.key))
        if self.top_n:
            out = out[: self.top_n]
        return out

    def _execute(
        self,
        d: OracleDatum,
        fetch_seg: dict[str, OracleDatum],
        link_seg: dict[str, OracleDatum],
    ) -> None:
        nd = OracleDatum(
            key=d.key, url=d.url, execute_count=d.execute_count + 1,
            depth=d.depth, meta=d.meta,
        )
        links: list[str] = []
        next_datums: list = []
        if self._robots is not None and not self._robots.allowed(host_of(d.url), d.url):
            nd.status, nd.code = STATUS_DB_FAILED, -2
        else:
            resp = self.requester.fetch(d.url, attempt=nd.execute_count)
            nd.code, nd.location = resp.code, resp.location
            if resp.code in SUCCESS_CODES:
                nd.status = STATUS_DB_SUCCESS
                if self._dispatcher is not None:
                    # visitor mode: handlers + parseLink produce the
                    # emitted datums; redirects only if a handler re-adds
                    from webcollector_spark.datum import CrawlDatums
                    from webcollector_spark.functions.page import Page

                    page = Page(
                        url=d.url, key=d.key, code=resp.code,
                        content=resp.content, content_type=resp.content_type,
                        meta=d.meta or {}, location=resp.location,
                    )
                    nxt = CrawlDatums()
                    self._dispatcher.dispatch(page, nxt)
                    next_datums = list(nxt)
                else:
                    if resp.code in (301, 302) and resp.location:
                        links.append(resp.location)
                    if (
                        resp.content
                        and resp.content_type
                        and "text/html" in resp.content_type
                        and self.auto_parse
                    ):
                        text, _ = decode_html(resp.content)
                        harvested = H.extract_links(text, d.url)
                        if not self._rule.is_empty():
                            harvested = [u for u in harvested if self._rule.satisfy(u)]
                        links.extend(harvested)
            else:
                nd.status = STATUS_DB_FAILED
        fetch_seg[nd.key] = nd  # last-wins within segment
        for u in links:
            _link_keep(link_seg, OracleDatum(key=u, url=u, depth=d.depth + 1))
        for vd in next_datums:
            k = vd.key() if vd._key is not None else vd.url()
            _link_keep(
                link_seg,
                OracleDatum(
                    key=k, url=vd.url(), depth=d.depth + 1,
                    meta=(dict(vd.meta_data) or None),
                ),
            )

    # -- inspection helpers for tests -----------------------------------
    def visited_keys(self) -> set[str]:
        return {k for k, d in self.db.items() if d.status != STATUS_DB_UNEXECUTED}

    def state(self) -> dict[str, tuple[int, int, int]]:
        return {k: (d.status, d.execute_count, d.code) for k, d in self.db.items()}

    def metas(self) -> dict[str, dict | None]:
        return {k: d.meta for k, d in self.db.items()}
