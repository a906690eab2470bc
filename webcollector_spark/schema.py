"""Table schemas and status constants.

CrawlDatum core mirrors /root/reference model/CrawlDatum.java:42-66 (the
persisted positional-JSON layout :299-328); graft columns host/depth/
priority per BASELINE.json north_rule. `meta` is stringly-typed
map<string,string> with typed accessors at read time, matching the
reference's Gson metaAsInt/Long/Double/Boolean (CrawlDatum.java:193-217).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Status enum — model/CrawlDatum.java:35-37,40
STATUS_DB_UNEXECUTED = 0
STATUS_DB_FAILED = 1
STATUS_DB_SUCCESS = 5
CODE_NOT_SET = -1

# Meta key carrying the datum "type" — model/CrawlDatum.java:126-134
META_KEY_TYPE = "s_t"

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),      # dedup identity; coalesce(key,url)
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("execute_time", T.LongType(), True),  # epoch ms; recorded, never scheduled on
        T.StructField("execute_count", T.IntegerType(), False),
        T.StructField("code", T.IntegerType(), False),
        T.StructField("location", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        # graft columns
        T.StructField("host", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

# input_hint: Iceberg table of image + caption pairs
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# Deterministic synthetic web (FIXTURES.md A2)
SITE_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), False),
        T.StructField("http_code", T.IntegerType(), False),
        T.StructField("location", T.StringType(), True),
    ]
)

# Per-round lineage/metrics manifest (FIXTURES.md A4); resume reads
# max committed round (reference analogue: Crawler.java:101-110).
ROUNDS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("generated", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("new_links", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# Transient per-round fetch result (model/Page.java:43-61 equivalent;
# never persisted as DOM — parsing happens inside Arrow UDF batches).
# Payload columns: image_id/phash/caption extracted from the fetched
# page; PSNR-vs-ground-truth is a test-side invariant (tests recompute
# generator pixels), engine-side parity check is verify_payload().
FETCHED_SCHEMA = T.StructType(
    list(FRONTIER_SCHEMA.fields)
    + [
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("charset", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        # Visitor-emitted next datums (key != url tasks with meta —
        # the Fetcher.java:246-255 flow); None in auto-parse mode where
        # plain link URLs ride the cheaper `links` array instead.
        T.StructField(
            "next_datums",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("url", T.StringType()),
                        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
                    ]
                )
            ),
            True,
        ),
        # robots Crawl-delay observed for this row's host (ms) — the
        # politeness gap the fetch pass actually honored. Feeds the next
        # round's host-budget clamp (config.host_budget_target_ms); null
        # when the host declares no Crawl-delay or robots is off.
        T.StructField("robots_delay_ms", T.LongType(), True),
    ]
)


def host_of(url: str) -> str:
    """Pure-Python host extraction (mirrors what the `host` column holds)."""
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0].split(":", 1)[0].lower()
