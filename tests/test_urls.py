"""URL canonicalization (functions/urls.py): the Python and JVM
implementations must agree rule-for-rule, and the crawl knob
(`canonicalize_link_keys`) must collapse alias links into one frontier
row while preserving the raw url for fetching."""

from pyspark.sql import functions as F

from webcollector_spark.functions.urls import canonical_url_col, canonicalize_url

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/Docs/5?b=2&a=1#frag",
     "http://www.example.com/Docs/5?a=1&b=2"),
    ("https://Host.com:443/", "https://host.com/"),
    ("https://host.com:8443/x", "https://host.com:8443/x"),  # non-default port kept
    ("http://host.com", "http://host.com/"),                 # empty path -> /
    ("http://host.com/A/B", "http://host.com/A/B"),          # path case preserved
    ("http://host.com/p?z=9&y=8&x=7", "http://host.com/p?x=7&y=8&z=9"),
    ("http://host.com/p#only-frag", "http://host.com/p"),
    ("relative/path", "relative/path"),                      # non-absolute untouched
]


def test_python_rules():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_jvm_column_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES if "://" in r], ["raw"])
    got = {
        r["raw"]: r["canon"]
        for r in df.select("raw", canonical_url_col(F.col("raw")).alias("canon"))
        .collect()
    }
    for raw, want in CASES:
        if "://" in raw:
            assert got[raw] == want, raw


def test_idempotent():
    for raw, want in CASES:
        assert canonicalize_url(want) == want


def test_crawl_knob_collapses_aliases(spark):
    """Two discovered aliases of one URL become ONE frontier key; with
    the knob off they stay two (reference-exact raw-string identity)."""
    from webcollector_spark.operators.parse import discovered_links

    fetched = spark.createDataFrame(
        [
            (
                "http://h/p0",
                ["HTTP://H:80/a?b=2&a=1#x", "http://h/a?a=1&b=2"],
                0,
                0.0,
            )
        ],
        "url string, links array<string>, depth int, priority double",
    )
    on = discovered_links(fetched, dedup=True, canonical_keys=True)
    assert on.select("key").distinct().count() == 1
    assert on.select("url").distinct().count() >= 1  # raw urls preserved
    off = discovered_links(fetched, dedup=True, canonical_keys=False)
    assert off.select("key").distinct().count() == 2
