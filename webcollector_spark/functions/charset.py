"""Charset detection — port of util/CharsetDetector.java:45-124.

Precedence (CharsetDetector.java:110-124): (1) Nutch-style meta-tag
regexes over the first bytes (:35-42), (2) BOM, (3) statistical detector
(Mozilla universalchardet in the reference; charset_normalizer here),
(4) utf-8 default. Pure Python — called inside Arrow UDF batches only
when the page actually needs decoding (lazy, like Page.java:363-381).
"""

from __future__ import annotations

import re

try:
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

# Nutch CharsetDetector regexes (CharsetDetector.java:35-42)
_META_RE = re.compile(
    rb"<meta\s+([^>]*http-equiv=(\"|')?content-type(\"|')?[^>]*)>", re.IGNORECASE
)
_CHARSET_RE = re.compile(rb"charset=\s*([a-z][_\-0-9a-z]*)", re.IGNORECASE)
_META5_RE = re.compile(rb"<meta\s+charset\s*=\s*[\"']?([a-z][_\-0-9a-z]*)", re.IGNORECASE)

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
]


def guess_encoding(content: bytes, sniff_len: int = 2000) -> str:
    head = content[:sniff_len]
    # 1. html meta tags
    m = _META_RE.search(head)
    if m:
        c = _CHARSET_RE.search(m.group(1))
        if c:
            return _normalize(c.group(1).decode("ascii", "ignore"))
    m = _META5_RE.search(head)
    if m:
        return _normalize(m.group(1).decode("ascii", "ignore"))
    # 2. BOM
    for bom, enc in _BOMS:
        if content.startswith(bom):
            return enc
    # 3. statistical
    if _cn_from_bytes is not None:
        best = _cn_from_bytes(head).best()
        if best is not None and best.encoding:
            return _normalize(best.encoding)
    # 4. default
    return "utf-8"


def _normalize(enc: str) -> str:
    enc = enc.strip().lower()
    try:
        b"x".decode(enc)
        return enc
    except (LookupError, UnicodeDecodeError):
        return "utf-8"


def decode_html(content: bytes, charset: str | None = None) -> tuple[str, str]:
    """bytes -> (html, charset). Lazy-decode equivalent of Page.java:363-381."""
    enc = charset or guess_encoding(content)
    try:
        return content.decode(enc, errors="replace"), enc
    except LookupError:
        return content.decode("utf-8", errors="replace"), "utf-8"
