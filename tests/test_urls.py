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
    extra = ["mailto:a@b.c", "javascript:void(0)", "/abs/path?b=1"]
    raws = [r for r, _ in CASES] + extra
    df = spark.createDataFrame([(r,) for r in raws], ["raw"])
    got = {
        r["raw"]: r["canon"]
        for r in df.select("raw", canonical_url_col(F.col("raw")).alias("canon"))
        .collect()
    }
    for raw in raws:
        assert got[raw] == canonicalize_url(raw), raw
    for raw, want in CASES:
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


# -- property tests (hypothesis): structural invariants over random URLs ----
from hypothesis import given, settings
from hypothesis import strategies as st

_host = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,10}[A-Za-z0-9])?(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}", fullmatch=True)
_params = st.lists(
    st.from_regex(r"[a-z]{1,4}=[A-Za-z0-9]{0,6}", fullmatch=True), max_size=5
)
_frag = st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS", "Http"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    qs = draw(_params)
    q = "?" + "&".join(qs) if qs else ""
    return f"{scheme}://{host}{port}{draw(_path)}{q}{draw(_frag)}"


@given(url=_urls())
@settings(max_examples=300, deadline=None)
def test_prop_idempotent_and_normalized(url):
    c = canonicalize_url(url)
    # idempotent fixpoint
    assert canonicalize_url(c) == c
    # scheme+host lowercased, fragment gone, path non-empty
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    assert "#" not in c
    host = rest.split("/", 1)[0]
    assert host == host.lower()
    assert "/" in rest
    # default ports stripped, others kept
    if scheme == "http":
        assert not host.endswith(":80")
    if scheme == "https":
        assert not host.endswith(":443")
    if ":8080" in url:
        assert host.endswith(":8080")


@given(url=_urls(), seed=st.integers(0, 2**31))
@settings(max_examples=300, deadline=None)
def test_prop_param_order_invariant(url, seed):
    """Shuffling query params never changes the canonical form."""
    import random

    if "?" not in url:
        return
    base, q = url.split("?", 1)
    frag = ""
    if "#" in q:
        q, f = q.split("#", 1)
        frag = "#" + f
    parts = q.split("&")
    random.Random(seed).shuffle(parts)
    assert canonicalize_url(url) == canonicalize_url(
        base + "?" + "&".join(parts) + frag
    )


def test_visitor_datums_canonical_default_keys(spark):
    """Visitor-emitted datums: default keys (key == url, as the fetch
    UDF materializes them) adopt the canonical form; explicit keys that
    differ from the url are never rewritten."""
    from webcollector_spark.operators.parse import discovered_datums

    fetched = spark.createDataFrame(
        [
            (
                "http://h/p0",
                [
                    {"key": "HTTP://H:80/a?b=2&a=1", "url": "HTTP://H:80/a?b=2&a=1",
                     "meta": None},
                    {"key": "user-key-7", "url": "http://h/a?a=1&b=2", "meta": None},
                ],
                0,
                0.0,
            )
        ],
        "url string, next_datums array<struct<key:string,url:string,"
        "meta:map<string,string>>>, depth int, priority double",
    )
    rows = {
        r["key"]
        for r in discovered_datums(fetched, canonical_keys=True).collect()
    }
    assert "http://h/a?a=1&b=2" in rows   # default key canonicalized
    assert "user-key-7" in rows           # explicit key untouched
    off = {
        r["key"]
        for r in discovered_datums(fetched, canonical_keys=False).collect()
    }
    assert "HTTP://H:80/a?b=2&a=1" in off
