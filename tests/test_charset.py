"""Charset detection tests — the reference's CharsetDetectorTest shape
(test/.../CharsetDetectorTest.java:34-49: KOI8-R, Windows-1251,
ISO-8859-7, utf-8 fallback) plus the meta-tag/BOM precedence of
util/CharsetDetector.java:110-124."""

from __future__ import annotations

from webcollector_spark.functions.charset import decode_html, guess_encoding


def _html_with_meta(charset: str, body: str, enc: str | None = None) -> bytes:
    html = (
        f'<html><head><meta http-equiv="Content-Type" '
        f'content="text/html; charset={charset}"/></head>'
        f"<body>{body}</body></html>"
    )
    return html.encode(enc or charset)


class TestMetaTag:
    def test_http_equiv_meta(self):
        assert guess_encoding(_html_with_meta("koi8-r", "тест")) == "koi8-r"

    def test_html5_meta(self):
        raw = '<html><head><meta charset="windows-1251"></head></html>'.encode()
        assert guess_encoding(raw) == "windows-1251"

    def test_meta_beats_bom(self):
        # precedence 1 over 2 (CharsetDetector.java:110-118)
        raw = b"\xef\xbb\xbf" + _html_with_meta("iso-8859-7", "abc", "ascii")
        assert guess_encoding(raw) == "iso-8859-7"

    def test_unknown_charset_falls_back_utf8(self):
        raw = _html_with_meta("no-such-enc", "abc", "ascii")
        assert guess_encoding(raw) == "utf-8"


class TestBomAndStatistical:
    def test_utf8_bom(self):
        assert guess_encoding(b"\xef\xbb\xbfhello") == "utf-8"

    def test_utf16_bom(self):
        assert guess_encoding("hi".encode("utf-16")) == "utf-16"

    def test_statistical_cyrillic(self):
        # CharsetDetectorTest.java asserts the Mozilla detector resolves
        # bare Cyrillic bytes; charset_normalizer must land on an
        # encoding that round-trips the text.
        text = "Привет мир, это тест русского текста " * 8
        raw = text.encode("windows-1251")
        enc = guess_encoding(raw)
        assert raw.decode(enc) == text

    def test_plain_ascii_default(self):
        assert guess_encoding(b"plain ascii text only") in ("utf-8", "ascii")


class TestDecode:
    def test_decode_roundtrip(self):
        raw = _html_with_meta("koi8-r", "привет")
        html, enc = decode_html(raw)
        assert enc == "koi8-r"
        assert "привет" in html

    def test_decode_never_raises(self):
        html, enc = decode_html(b"\xff\xfe\xfd garbage \x80\x81")
        assert isinstance(html, str) and enc
