"""Page — the per-document expression library (reference model/Page.java).

A transient fetch result with lazy decode (bytes -> html on first
access, Page.java:363-381) and lazy DOM (html -> tree on first access,
Page.java:403-416). Every accessor of the reference's Page API is
mirrored 1:1; see per-method citations. Instances live only inside
Arrow UDF batches — Spark never serializes a Page.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urldefrag, urljoin

from webcollector_spark.functions.charset import decode_html
from webcollector_spark.functions.dom import Element, parse_html
from webcollector_spark.functions.regex_rule import RegexRule


class Page:
    def __init__(
        self,
        url: str,
        content: bytes | None = None,
        content_type: str | None = None,
        html: str | None = None,
        code: int = -1,
        key: str | None = None,
        meta: dict[str, str] | None = None,
        location: str | None = None,
    ):
        self.url = url
        self.key = key if key is not None else url  # CrawlDatum.java:239-245
        self.code = code
        self.location = location  # redirect target (CrawlDatum.location)
        self.content_type = content_type
        self.content = content
        self.meta = meta or {}
        self._html = html
        self._charset: str | None = None
        self._doc: Element | None = None

    def copy_meta(self) -> dict[str, str]:
        """Page.copyMeta — a copy of the datum's metaData for handing to
        emitted next-datums (the DemoBingCrawler redirect pattern)."""
        return dict(self.meta)

    # -- match helpers (Page.java:69-103, CrawlDatum.java:80-106) ------
    def match_url(self, regex: str) -> bool:
        return re.fullmatch(regex, self.url) is not None

    def match_url_regex_rule(self, rules: list[str]) -> bool:
        return RegexRule(rules).satisfy(self.url)

    def match_type(self, type_: str | None) -> bool:
        # type lives at meta key "s_t" (CrawlDatum.java:126-134)
        return self.meta.get("s_t") == type_

    def match_content_type(self, regex: str | None) -> bool:
        if regex is None:
            return self.content_type is None
        return (
            self.content_type is not None
            and re.fullmatch(regex, self.content_type) is not None
        )

    # -- lazy decode / parse (Page.java:363-381, :403-416) -------------
    @property
    def html(self) -> str:
        if self._html is None:
            if self.content is None:
                self._html = ""
            else:
                self._html, self._charset = decode_html(self.content)
        return self._html

    @property
    def charset(self) -> str | None:
        _ = self.html
        return self._charset

    def doc(self) -> Element:
        if self._doc is None:
            self._doc = parse_html(self.html)
        return self._doc

    # -- CSS select (Page.java:274-285; negative index wraps) ----------
    def select(self, css: str, index: int | None = None):
        els = self.doc().select(css)
        if index is None:
            return els
        return els[index] if -len(els) <= index < len(els) else None

    def select_text(self, css: str, index: int = 0) -> str | None:
        """Page.selectText — first (or idx-th) element's text, trimmed
        (Page.java:206-216)."""
        el = self.select(css, index)
        return el.text() if el is not None else None

    def select_text_list(self, css: str) -> list[str]:
        return [el.text() for el in self.select(css)]

    def select_int(self, css: str, index: int = 0) -> int | None:
        t = self.select_text(css, index)
        return int(t.strip()) if t is not None else None

    def select_long(self, css: str, index: int = 0) -> int | None:
        return self.select_int(css, index)

    def select_double(self, css: str, index: int = 0) -> float | None:
        t = self.select_text(css, index)
        return float(t.strip()) if t is not None else None

    def select_int_list(self, css: str) -> list[int]:
        return [int(t.strip()) for t in self.select_text_list(css)]

    def select_double_list(self, css: str) -> list[float]:
        return [float(t.strip()) for t in self.select_text_list(css)]

    # -- attributes (Page.java:138-159) --------------------------------
    def attr(self, css: str, attr_name: str) -> str | None:
        el = self.select(css, 0)
        return el.attr(attr_name) if el is not None else None

    def attrs(self, css: str, attr_name: str) -> list[str]:
        return [
            el.attr(attr_name)
            for el in self.select(css)
            if el.attr(attr_name) is not None
        ]

    # -- links (Page.java:162-204; jsoup abs:href ≙ urljoin) -----------
    def links(self, css: str = "a", parse_src: bool = False) -> list[str]:
        out: list[str] = []
        for el in self.select(css):
            for a in ("href",) + (("src",) if parse_src else ()):
                v = el.attr(a)
                if not v or v.startswith(("javascript:", "mailto:", "#", "data:")):
                    continue
                absu = urldefrag(urljoin(self.url, v))[0]
                if absu.startswith(("http://", "https://")):
                    out.append(absu)
        return out

    def regex_links(self, regex: str, parse_src: bool = False) -> list[str]:
        return [
            u
            for u in self.links("a" if not parse_src else "*", parse_src)
            if re.fullmatch(regex, u)
        ]

    # -- raw-html regex (Page.java:287-321) ----------------------------
    def regex(
        self, pattern: str, group: int = 0, default: str | None = None
    ) -> str | None:
        m = re.search(pattern, self.html, re.DOTALL)
        return m.group(group) if m else default

    def regex_and_format(self, pattern: str, fmt: str) -> str | None:
        """Page.regexAndFormat — groups fed into a format template
        (Page.java:307-321); fmt uses {1},{2}... placeholders."""
        m = re.search(pattern, self.html, re.DOTALL)
        if not m:
            return None
        return fmt.format(*([m.group(0)] + list(m.groups())))

    # -- JSON (Page.java:105-127) --------------------------------------
    def json_object(self) -> dict:
        return json.loads(self.html)

    def json_array(self) -> list:
        return json.loads(self.html)

    def regex_json_object(self, pattern: str, group: int = 0) -> dict | None:
        s = self.regex(pattern, group)
        return json.loads(s) if s is not None else None

    def regex_json_array(self, pattern: str, group: int = 0) -> list | None:
        s = self.regex(pattern, group)
        return json.loads(s) if s is not None else None
