"""Conditional revalidation end to end — this session's crawl-loop
additions tied together on the deterministic synthetic web:

  1. crawl with `revalidate=True`: every 200 stores its ETag in
     meta["etag"] (survives the MERGE into the frontier);
  2. archive round 1 as .warc.gz `resource` records;
  3. one page's content changes (`bump_page`), everything else stays;
  4. recrawl: unchanged pages answer **304** (zero payload bytes),
     the changed page refetches and rotates its validator;
  5. archive the recrawl with `revisit_plan_not_modified`: 304s become
     WARC `server-not-modified` revisit records (no bytes, no digest —
     nothing was transferred to hash) referring to round 1's captures;
  6. resolve the two archives together: every revisit materializes
     round 1's bytes with resolved_ok;
  7. the `revalidation_savings` rollup prints what the 304 path saved.

    python examples/demo_revalidation_roundtrip.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators.delta import revalidation_savings
from webcollector_spark.operators.recrawl import schedule_recrawl
from webcollector_spark.operators.shards import pack_shards
from webcollector_spark.operators.warc import (
    read_warc,
    resolve_revisits,
    revisit_plan_not_modified,
    write_warc,
)
from webcollector_spark.session import get_spark
from webcollector_spark.sources.requester import SyntheticRequester


def main() -> int:
    spark = get_spark("revalidate-demo", cores=8, shuffle_partitions=8)
    corpus = fixtures.make_corpus(60)
    graph = fixtures.make_site_graph(60, n_hosts=5, out_degree=3)
    req = SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records")
    )
    tmp = Path(tempfile.mkdtemp(prefix="revalidate_demo_"))

    crawler = RamCrawler(
        spark, req, config=CrawlerConfig(revalidate=True, keep_content=True)
    )
    crawler.add_seed(fixtures.seeds_for(graph, 4))
    crawler.start(3)

    fetched1 = (
        crawler.store.load()
        .filter((F.col("status") == 5) & (F.col("code") == 200))
        .select("key", "url", "execute_time", "meta")
    )
    n1 = fetched1.count()
    print(f"round-1 crawl: {n1} pages fetched, validators stored")

    # Page BYTES for the archive come from a re-fetch of the stored
    # keys (the frontier deliberately drops content; a real deployment
    # archives from the fetched-history table written during rounds).
    rows1 = [
        (r.key, r.url, req.fetch(r.url).content, "text/html",
         r.execute_time)
        for r in fetched1.collect()
    ]
    r1 = spark.createDataFrame(
        rows1,
        "key string, url string, content binary, content_type string, "
        "execute_time long",
    )
    out1 = str(tmp / "warc_round1")
    a1 = pack_shards(
        r1.withColumn("sz", F.octet_length("content")),
        key="key", size="sz", target_bytes=64_000,
        carry=("url", "content", "content_type", "execute_time"),
    )
    m1 = write_warc(a1, out1).collect()
    print(f"round-1 archive: {sum(m.n_records for m in m1)} resource records "
          f"in {len(m1)} shard(s)")

    # --- something changes ------------------------------------------
    bumped = sorted(r.key for r in fetched1.collect())[0]
    req.bump_page(bumped)
    print(f"content changed on: {bumped}")

    now = int(time.time() * 1000)
    n = schedule_recrawl(crawler.store, now_ms=now, min_age_ms=0)
    crawler.start(4)

    recrawled = crawler.store.load().filter(F.col("execute_count") >= 2)
    codes = {
        r.key: (r.code, dict(r.meta or {})) for r in recrawled.collect()
    }
    n304 = sum(1 for c, _ in codes.values() if c == 304)
    print(f"recrawl: {n} rescheduled -> {n304} not-modified (304), "
          f"{sum(1 for c, _ in codes.values() if c == 200)} refetched")

    # --- archive the recrawl: 304s as server-not-modified revisits ---
    rows2 = []
    for key, (code, meta) in codes.items():
        body = req.fetch(key).content if code == 200 else None
        rows2.append(
            (key, key, body, "text/html", now + 1000,
             {"not_modified": meta.get("not_modified")}
             if meta.get("not_modified") else {})
        )
    r2 = spark.createDataFrame(
        rows2,
        "key string, url string, content binary, content_type string, "
        "execute_time long, meta map<string,string>",
    )
    planned = revisit_plan_not_modified(r2, r1)
    a2 = pack_shards(
        planned.withColumn(
            "sz",
            F.when(F.col("revisit_of").isNull(), F.octet_length("content"))
            .otherwise(F.lit(0)),
        ),
        key="key", size="sz", target_bytes=64_000,
        carry=("url", "content", "content_type", "execute_time",
               "revisit_of", "refers_to_url", "refers_to_ms",
               "revisit_profile"),
    )
    out2 = str(tmp / "warc_round2")
    write_warc(
        a2, out2, revisit_of_col="revisit_of", profile_col="revisit_profile"
    ).collect()

    recs = read_warc(spark, out1).unionByName(read_warc(spark, out2))
    resolved = resolve_revisits(recs).filter(
        F.col("record_type") == "revisit"
    )
    ok = resolved.filter("resolved_ok").count()
    print(f"round-2 archive: {resolved.count()} server-not-modified "
          f"revisits, {ok} resolve to round-1 bytes")

    # --- the savings rollup -----------------------------------------
    sizes = {r.key: len(r.content) if r.content else 0 for r in r1.collect()}
    log = spark.createDataFrame(
        [
            (key.split("/")[2], code, sizes.get(key, 0))
            for key, (code, _) in codes.items()
        ],
        "host string, code int, size_bytes long",
    )
    print("per-host revalidation savings:")
    revalidation_savings(log).orderBy("host").show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
