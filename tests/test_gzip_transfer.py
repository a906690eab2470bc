"""Content-Encoding handling (RFC 9110 §8.4): the wire compression
real servers apply to HTML. Unit behavior of decoded_content, the
deterministic gzip-serving synthetic web, and the end-to-end
invariant: a crawl over gzip-served pages equals the identity-served
crawl in every harvested column."""

from __future__ import annotations

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.sources.requester import Response, SyntheticRequester


def test_decoded_content_unit():
    body = b"<html>payload</html>" * 50
    assert Response(200, content=body).decoded_content() == body
    assert (
        Response(200, content=body, content_encoding="identity").decoded_content()
        == body
    )
    gz = Response(200, content=gzip.compress(body), content_encoding="gzip")
    assert gz.decoded_content() == body
    zl = Response(200, content=zlib.compress(body), content_encoding="deflate")
    assert zl.decoded_content() == body
    # the historical raw-deflate-under-'deflate' server bug
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = Response(
        200, content=co.compress(body) + co.flush(), content_encoding="deflate"
    )
    assert raw.decoded_content() == body
    assert Response(200, content=None, content_encoding="gzip").decoded_content() is None
    with pytest.raises(NotImplementedError, match="br"):
        Response(200, content=b"x", content_encoding="br").decoded_content()
    with pytest.raises(ValueError, match="guard"):
        Response(
            200, content=b"x" * 100, content_encoding="gzip"
        ).decoded_content(max_encoded=10)


def test_synthetic_web_serves_deterministic_gzip(small_web):
    graph, corpus = small_web
    plain = SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records")
    )
    gzweb = SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records"), gzip_pages=True
    )
    encodings = set()
    for url in list(graph["url"])[:20]:
        a, b = plain.fetch(url), gzweb.fetch(url)
        if a.code != 200:
            continue
        encodings.add(b.content_encoding)
        assert b.decoded_content() == a.content, url
        if b.content_encoding == "gzip":
            assert b.content[:2] == b"\x1f\x8b"  # really compressed on the wire
            assert b.etag == a.etag  # entity tag is of the representation
    assert encodings == {None, "gzip"}  # the split actually happens


def test_crawl_over_gzip_web_equals_identity_crawl(spark, small_web):
    graph, corpus = small_web

    def crawl(gz: bool):
        req = SyntheticRequester(
            graph.to_dict("records"), corpus.to_dict("records"), gzip_pages=gz
        )
        c = RamCrawler(spark, req, config=CrawlerConfig())
        c.add_seed(fixtures.seeds_for(graph, 3))
        c.start(3)
        return {
            r.key: (r.status, r.code, r.execute_count)
            for r in c.store.load().collect()
        }

    assert crawl(True) == crawl(False)
