"""Sitemap ingestion — seed/frontier discovery from sitemaps.org XML.

NOT in the reference (verified: no match for ``sitemap`` anywhere under
``src/main/java``): WebCollector only discovers URLs by following
anchors (``model/Links.java:134-148``). A production crawler's richest
seed source is the site's own ``sitemap.xml`` — it lists pages no anchor
points at, carries the publisher's change hints (``lastmod``,
``changefreq``) that feed the recrawl clock (operators/recrawl.py), and
a relative ``priority`` the scheduler can fold into the frontier's
priority column.

Spark-first shape: the whole parse is JVM regex over the fetched
``content`` column — ``regexp_extract_all`` splits the ``<url>`` /
``<sitemap>`` blocks, per-block ``regexp_extract`` pulls the fields;
zero Python, whole-stage codegen, and the explode output is bounded by
the 50k-URL-per-file limit the protocol itself imposes. Nested
``<sitemapindex>`` files need no recursion machinery: each child
sitemap's URL is minted as a normal frontier row, the next BFS round
fetches it, and detection is CONTENT-based (``<urlset``/``<sitemapindex``
in the first bytes), so the round loop IS the recursion — depth-bounded,
politeness-bucketed, and resumable like every other fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcollector_spark.operators.parse import _mint_frontier_cols

# sitemaps.org: a sitemap file MUST be UTF-8.
_BLOCK_URL = r"(?s)<url>(.*?)</url>"
_BLOCK_IDX = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"<lastmod>\s*([^<\s]+)\s*</lastmod>"
_CHANGEFREQ = r"<changefreq>\s*([a-zA-Z]+)\s*</changefreq>"
_PRIORITY = r"<priority>\s*([0-9.]+)\s*</priority>"


def is_sitemap_content(txt_col):
    """Content-based detection — a sitemap served as text/plain or with
    a miscapitalized content-type still parses."""
    return txt_col.contains("<urlset") | txt_col.contains("<sitemapindex")


def sitemap_entries(fetched: DataFrame) -> DataFrame:
    """Extract (page_url, loc, lastmod, changefreq, sm_priority,
    is_index) rows from every fetched page whose body is a sitemap.

    One filter + one explode per block kind; everything is codegen'd
    JVM regex. Rows whose ``<url>`` block lacks a ``<loc>`` are dropped
    (the spec makes loc mandatory)."""
    txt = F.decode(F.col("content"), "UTF-8")
    base = (
        fetched.filter(F.col("content").isNotNull())
        .withColumn("__txt", txt)
        .filter(is_sitemap_content(F.col("__txt")))
        .select(
            F.col("url").alias("page_url"),
            F.col("depth"),
            F.col("priority"),
            "__txt",
        )
    )

    def fields(block, is_index):
        return [
            F.col("page_url"),
            F.col("depth"),
            F.col("priority"),
            F.regexp_extract(block, _LOC, 1).alias("loc"),
            F.nullif(
                F.regexp_extract(block, _LASTMOD, 1), F.lit("")
            ).alias("lastmod"),
            F.nullif(
                F.lower(F.regexp_extract(block, _CHANGEFREQ, 1)), F.lit("")
            ).alias("changefreq"),
            # spec default priority is 0.5
            F.coalesce(
                F.nullif(F.regexp_extract(block, _PRIORITY, 1), F.lit("")),
                F.lit("0.5"),
            )
            .cast("double")
            .alias("sm_priority"),
            F.lit(is_index).alias("is_index"),
        ]

    urls = base.select(
        "page_url",
        "depth",
        "priority",
        F.explode(F.regexp_extract_all("__txt", F.lit(_BLOCK_URL), F.lit(1))).alias(
            "__b"
        ),
    ).select(*fields(F.col("__b"), False))
    idx = base.select(
        "page_url",
        "depth",
        "priority",
        F.explode(F.regexp_extract_all("__txt", F.lit(_BLOCK_IDX), F.lit(1))).alias(
            "__b"
        ),
    ).select(*fields(F.col("__b"), True))
    return urls.unionByName(idx).filter(F.col("loc") != "")


def sitemap_datums(entries: DataFrame) -> DataFrame:
    """Mint frontier rows from sitemap entries.

    * key = url = loc (default O13 identity; the crawler's
      ``canonicalize_link_keys`` knob applies downstream exactly as for
      anchor links because these rows ride the same link-segment path).
    * priority = parent_priority + 0.5 - sm_priority: the scheduler's
      priority is lower-is-sooner (operators/generate.py), the sitemap's
      is higher-is-better with default 0.5 — so a default-priority entry
      inherits its parent's slot and a priority-1.0 entry jumps half a
      level ahead. Deterministic, no floats beyond one add.
    * lastmod/changefreq survive in meta (plus ``s_sm`` marking the
      discovery source) where the recrawl-interval learner can read
      them; nested sitemaps get no special row — content detection makes
      the next round's fetch parse them.
    """
    e = entries.withColumn("depth", F.col("depth") + 1).withColumn(
        "priority", F.col("priority") + F.lit(0.5) - F.col("sm_priority")
    )
    meta = F.map_filter(
        F.create_map(
            F.lit("s_sm"), F.lit("1"),
            F.lit("lastmod"), F.col("lastmod"),
            F.lit("changefreq"), F.col("changefreq"),
        ),
        lambda _, v: v.isNotNull(),
    )
    return e.select(*_mint_frontier_cols(F.col("loc"), F.col("loc"), meta))


def sitemaps_from_robots(requester, hosts) -> list[str]:
    """Harvest ``Sitemap:`` directives (RFC 9309 §2.3 non-group lines)
    from the robots.txt of each host. Driver-side and bounded by the
    DISTINCT SEED hosts (the user-provided seed list is already a
    driver-side object) — never called per frontier row; sitemaps of
    crawl-discovered hosts arrive through content detection instead."""
    out: list[str] = []
    for host in sorted(set(hosts)):
        body = requester.robots_txt(host)
        if not body:
            continue
        for line in body.splitlines():
            k, _, v = line.partition(":")
            if k.strip().lower() == "sitemap" and v.strip():
                out.append(v.strip())
    return out


def render_sitemap(urls: list[dict]) -> bytes:
    """Fixture helper: serialize entries (dicts with loc and optional
    lastmod/changefreq/priority) into a spec-shaped urlset document."""
    blocks = []
    for u in urls:
        parts = [f"<loc>{u['loc']}</loc>"]
        for k in ("lastmod", "changefreq", "priority"):
            if u.get(k) is not None:
                parts.append(f"<{k}>{u[k]}</{k}>")
        blocks.append("<url>" + "".join(parts) + "</url>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(blocks)
        + "\n</urlset>"
    )
    return doc.encode("utf-8")


def render_sitemap_index(locs: list[str]) -> bytes:
    blocks = "\n".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + blocks
        + "\n</sitemapindex>"
    )
    return doc.encode("utf-8")
