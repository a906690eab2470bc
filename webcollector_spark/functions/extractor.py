"""ContentExtractor — text-density news/content extraction
(reference contentextractor/ContentExtractor.java, 526 LoC; News POJO
contentextractor/News.java:26-88).

Faithful reimplementation of the algorithm on our stdlib DOM:
* clean(): drop script/noscript/style/iframe/br (":69-71")
* computeInfo(): bottom-up per-element {textCount, linkTextCount,
  tagCount, linkTagCount, density, densitySum, pCount, leaf lengths}
  (":73-120")
* computeScore() = log(sqrt(var(leaves)+1)) * densitySum
  * log(pureText+1) * log10(pCount+2) (":122-127")
* getContentElement(): argmax score over all elements except <a> and
  <body> (":149-169")
* getTitle(): h1-h6 before the content element scored by
  (position+1) * LCS-similarity to <title>; fallback id/class
  ^=title/$=title with 5 < len < 40; fallback max-similarity text node
  (":262-278, :284-347, :349-374; lcs ":376-397")
* getTime()/getDate(): datetime regex over outerHtml, walking 2
  parents up then up to 6 ancestors (":200-232, :234-260")

Spark mapping (SURVEY §2.3): the whole extractor is one vectorized
pandas UDF `extract_news_udf` over an html string column -> struct
<title, content, time>; the tree walk stays plain Python per document
inside the Arrow batch.

Known divergence from the reference: jsoup counts whitespace-only text
nodes as length-1 leaves after normalization; our DOM drops them (leaf
accounting only over non-empty normalized runs). This shifts var() by
O(#whitespace nodes) and does not change the argmax on real pages.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import pandas as pd  # module-level: postponed annotations on the
# pandas UDF below resolve 'pd.Series'/'pd.DataFrame' through module
# globals — a function-local import leaves them unresolvable and
# pyspark's type-hint inference rejects the UDF signature

from webcollector_spark.functions.dom import Element, parse_html

_TIME_RE = re.compile(
    r"([1-2][0-9]{3})[^0-9]{1,5}?([0-1]?[0-9])[^0-9]{1,5}?([0-9]{1,2})"
    r"[^0-9]{1,5}?([0-2]?[1-9])[^0-9]{1,5}?([0-9]{1,2})[^0-9]{1,5}?([0-9]{1,2})"
)
_DATE_RE = re.compile(
    r"([1-2][0-9]{3})[^0-9]{1,5}?([0-1]?[0-9])[^0-9]{1,5}?([0-9]{1,2})"
)


@dataclass
class News:
    url: str | None = None
    title: str | None = None
    content: str | None = None
    time: str | None = None


class _CountInfo:
    __slots__ = (
        "text_count", "link_text_count", "tag_count", "link_tag_count",
        "density", "density_sum", "p_count", "leaf_list",
    )

    def __init__(self):
        self.text_count = 0
        self.link_text_count = 0
        self.tag_count = 0
        self.link_tag_count = 0
        self.density = 0.0
        self.density_sum = 0.0
        self.p_count = 0
        self.leaf_list: list[int] = []


class ContentExtractor:
    def __init__(self, root: Element):
        self.root = root
        self.body = root.select_first("body") or root
        self.info: dict[int, _CountInfo] = {}
        self.elements: dict[int, Element] = {}

    # -- clean (":69-71") ----------------------------------------------
    def clean(self) -> None:
        for el in list(self.root.select("script,noscript,style,iframe,br")):
            el.remove()

    # -- computeInfo (":73-120") ---------------------------------------
    def compute_info(self, el: Element) -> _CountInfo:
        ci = _CountInfo()
        # interleave text leaves and child elements exactly as childNodes
        for i, child in enumerate(el.children):
            ci_text = self._text_info(el.texts[i])
            self._fold(ci, ci_text)
            self._fold(ci, self.compute_info(child))
        self._fold(ci, self._text_info(el.texts[len(el.children)]))

        ci.tag_count += 1
        if el.tag == "a":
            ci.link_text_count = ci.text_count
            ci.link_tag_count += 1
        elif el.tag == "p":
            ci.p_count += 1

        pure_len = ci.text_count - ci.link_text_count
        length = ci.tag_count - ci.link_tag_count
        ci.density = 0.0 if (pure_len == 0 or length == 0) else pure_len / length
        self.info[id(el)] = ci
        self.elements[id(el)] = el
        return ci

    @staticmethod
    def _text_info(raw: str) -> _CountInfo:
        ci = _CountInfo()
        text = re.sub(r"\s+", " ", raw).strip()
        if text:
            ci.text_count = len(text)
            ci.leaf_list.append(len(text))
        return ci

    @staticmethod
    def _fold(acc: _CountInfo, child: _CountInfo) -> None:
        acc.text_count += child.text_count
        acc.link_text_count += child.link_text_count
        acc.tag_count += child.tag_count
        acc.link_tag_count += child.link_tag_count
        acc.leaf_list.extend(child.leaf_list)
        acc.density_sum += child.density
        acc.p_count += child.p_count

    # -- score (":122-147") --------------------------------------------
    @staticmethod
    def _var(data: list[int]) -> float:
        if not data:
            return 0.0
        if len(data) == 1:
            return data[0] // 2  # Java int division (ContentExtractor computeVar)
        ave = sum(data) / len(data)
        return sum((x - ave) ** 2 for x in data) / len(data)

    def compute_score(self, el: Element) -> float:
        ci = self.info[id(el)]
        var = math.sqrt(self._var(ci.leaf_list) + 1)
        pure = ci.text_count - ci.link_text_count
        return (
            math.log(var)
            * ci.density_sum
            * math.log(pure + 1)
            * math.log10(ci.p_count + 2)
        )

    # -- content (":149-169") ------------------------------------------
    def get_content_element(self) -> Element:
        self.clean()
        self.compute_info(self.body)
        max_score, content = 0.0, None
        for key, el in self.elements.items():
            if el.tag == "a" or el is self.body:
                continue
            score = self.compute_score(el)
            if score > max_score:
                max_score, content = score, el
        if content is None:
            raise ValueError("extraction failed")
        return content

    # -- title (":262-347") --------------------------------------------
    @staticmethod
    def _lcs(x: str, y: str) -> int:
        m, n = len(x), len(y)
        if m == 0 or n == 0:
            return 0
        prev = [0] * (n + 1)
        for i in range(m - 1, -1, -1):
            cur = [0] * (n + 1)
            for j in range(n - 1, -1, -1):
                if x[i] == y[j]:
                    cur[j] = prev[j + 1] + 1
                else:
                    cur[j] = max(prev[j], cur[j + 1])
            prev = cur
        return prev[0]

    @classmethod
    def _str_sim(cls, a: str, b: str) -> float:
        len1, len2 = len(a), len(b)
        if len1 == 0 or len2 == 0:
            return 0.0
        ratio = len1 / len2 if len1 > len2 else len2 / len1
        if ratio >= 3:
            return 0.0
        return cls._lcs(a, b) / max(len1, len2)

    def get_title(self, content_element: Element) -> str:
        title_el = self.root.select_first("title")
        meta_title = title_el.text().strip() if title_el is not None else ""
        if meta_title:
            sims: list[tuple[Element, float]] = []
            content_index = None
            for el in self.body.iter():
                if el is content_element:
                    content_index = len(sims)
                    break
                if re.fullmatch(r"h[1-6]", el.tag):
                    sims.append((el, self._str_sim(el.text().strip(), meta_title)))
            if content_index:
                max_score, best = 0.0, None
                for i, (el, sim) in enumerate(sims[:content_index]):
                    score = (i + 1) * sim
                    if score > max_score:
                        max_score, best = score, el
                if best is not None:
                    return best.text()

        titles = self.body.select(
            "*[id^=title],*[id$=title],*[class^=title],*[class$=title]"
        )
        if titles:
            t = titles[0].text()
            if 5 < len(t) < 40:
                return t
        return self._title_by_sim(meta_title)

    def _title_by_sim(self, meta_title: str) -> str:
        """Fallback: max-similarity text node (":349-374")."""
        best_sim, best = 0.0, ""
        for el in self.body.iter():
            for frag in el.texts:
                text = frag.strip()
                if not text:
                    continue
                sim = self._str_sim(text, meta_title)
                if sim > 0 and sim > best_sim:
                    best_sim, best = sim, text
        if best:
            return best
        raise ValueError("title not found")

    # -- time (":200-260") ---------------------------------------------
    def _walk_time(self, content_element: Element, pattern, fmt) -> str | None:
        current = content_element
        for _ in range(2):
            if current is not None and current is not self.body:
                if current.parent is not None:
                    current = current.parent
        for _ in range(6):
            if current is None:
                break
            m = pattern.search(current.outer_html())
            if m:
                return fmt(m)
            if current is not self.body:
                current = current.parent
        return None

    def get_time(self, content_element: Element) -> str:
        out = self._walk_time(
            content_element,
            _TIME_RE,
            lambda m: f"{m.group(1)}-{m.group(2)}-{m.group(3)} "
            f"{m.group(4)}:{m.group(5)}:{m.group(6)}",
        )
        if out is not None:
            return out
        out = self._walk_time(
            content_element,
            _DATE_RE,
            lambda m: f"{m.group(1)}-{m.group(2)}-{m.group(3)}",
        )
        if out is None:
            raise ValueError("time not found")
        return out

    # -- getNews (":171-198") ------------------------------------------
    def get_news(self, url: str | None = None) -> News:
        news = News(url=url)
        content = self.get_content_element()
        news.content = content.text()
        try:
            news.time = self.get_time(content)
        except ValueError:
            pass
        try:
            news.title = self.get_title(content)
        except ValueError:
            pass
        return news


# -- static API (":436-512") ------------------------------------------
def get_news_by_html(html: str, url: str | None = None) -> News:
    return ContentExtractor(parse_html(html)).get_news(url)


def get_content_by_html(html: str) -> str:
    return ContentExtractor(parse_html(html)).get_content_element().text()


def extract_news_udf():
    """Vectorized pandas UDF: html -> struct<title,content,time>."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("title", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("time", T.StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def _extract(html: pd.Series) -> pd.DataFrame:
        rows = []
        for doc in html:
            try:
                n = get_news_by_html(doc or "")
                rows.append({"title": n.title, "content": n.content, "time": n.time})
            except Exception:
                rows.append({"title": None, "content": None, "time": None})
        return pd.DataFrame(rows, columns=["title", "content", "time"])

    return _extract
