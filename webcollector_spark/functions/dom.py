"""Minimal DOM + CSS selector subset on stdlib html.parser.

The reference leans on jsoup (`Page.doc()` model/Page.java:403-416,
`select(css)` :274-285, `Links.addBySelector` model/Links.java:114-129);
this sandbox has no lxml/bs4, so extraction UDFs build this lightweight
tree instead. It runs *inside* Arrow UDF batches — one Python tree per
document, vectorized at the batch boundary — never row-at-a-time at the
Spark layer.

Selector subset (covers every selector the reference's own code and
demos use): tag, `*`, `#id`, `.class`, `[attr]`, `[attr=value]`,
`[attr^=prefix]`, `[attr$=suffix]`, compound (`p.caption`), descendant
(whitespace), child (`>`), and comma-separated groups.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS_RE = re.compile(r"\s+")


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element] = []
        self.parent = parent
        # text fragments directly under this element, interleaved by child
        # position: texts[i] precedes children[i]; texts[-1] trails.
        self.texts: list[str] = [""]

    # -- text ----------------------------------------------------------
    def own_text(self) -> str:
        """Text directly inside this element (not descendants), normalized."""
        return _WS_RE.sub(" ", "".join(self.texts)).strip()

    def text(self) -> str:
        """All descendant text in document order, whitespace-normalized
        (jsoup Element.text() semantics used by Page.selectText)."""
        parts: list[str] = []

        def walk(el: Element) -> None:
            for i, child in enumerate(el.children):
                parts.append(el.texts[i])
                walk(child)
            parts.append(el.texts[len(el.children)])

        walk(self)
        return _WS_RE.sub(" ", "".join(parts)).strip()

    # -- attributes ----------------------------------------------------
    def attr(self, name: str) -> str | None:
        return self.attrs.get(name.lower())

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # -- traversal -----------------------------------------------------
    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def select(self, css: str) -> list["Element"]:
        """All matching descendants (self included), document order."""
        out: list[Element] = []
        seen: set[int] = set()
        for group in _parse_selector(css):
            for el in self.iter():
                if id(el) not in seen and _matches_chain(el, group, self):
                    seen.add(id(el))
                    out.append(el)
        if len(_parse_selector(css)) > 1:  # keep document order across groups
            order = {id(e): i for i, e in enumerate(self.iter())}
            out.sort(key=lambda e: order[id(e)])
        return out

    def select_first(self, css: str) -> "Element | None":
        res = self.select(css)
        return res[0] if res else None

    def outer_html(self) -> str:
        """Re-serialize this subtree (ContentExtractor's time regex scans
        outerHtml, ContentExtractor.java:215/252)."""
        parts: list[str] = []

        def walk(el: Element) -> None:
            if el.tag != "#root":
                attrs = "".join(f' {k}="{v}"' for k, v in el.attrs.items())
                parts.append(f"<{el.tag}{attrs}>")
            for i, child in enumerate(el.children):
                parts.append(el.texts[i])
                walk(child)
            parts.append(el.texts[len(el.children)])
            if el.tag != "#root" and el.tag not in VOID_TAGS:
                parts.append(f"</{el.tag}>")

        walk(self)
        return "".join(parts)

    def remove(self) -> None:
        """Detach from parent (ContentExtractor.clean strips script/style)."""
        if self.parent is not None:
            i = self.parent.children.index(self)
            # merge surrounding text slots so indices stay consistent
            self.parent.texts[i] = self.parent.texts[i] + self.parent.texts[i + 1]
            del self.parent.texts[i + 1]
            self.parent.children.pop(i)
            self.parent = None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    RAWTEXT = frozenset({"script", "style"})

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {}, None)
        self.stack = [self.root]
        self._raw: str | None = None

    def handle_starttag(self, tag, attrs):
        if self._raw:
            return
        parent = self.stack[-1]
        el = Element(tag, {k.lower(): (v or "") for k, v in attrs}, parent)
        parent.children.append(el)
        parent.texts.append("")
        if tag in self.RAWTEXT:
            self._raw = tag
            self.stack.append(el)
        elif tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        if self._raw:
            return
        parent = self.stack[-1]
        el = Element(tag, {k.lower(): (v or "") for k, v in attrs}, parent)
        parent.children.append(el)
        parent.texts.append("")

    def handle_endtag(self, tag):
        if self._raw:
            if tag == self._raw:
                self._raw = None
                self.stack.pop()
            return
        # close nearest matching open tag (tolerant of bad nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        el = self.stack[-1]
        el.texts[len(el.children)] += data


def parse_html(html: str) -> Element:
    """Parse HTML into an Element tree; returns the synthetic root."""
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


# ---------------------------------------------------------------------------
# CSS selector subset

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9]*|\*)?"
    r"(?P<quals>(?:[.#][-\w]+|\[[-\w]+(?:[\^$]?=[^\]]*)?\])*)"
)
_QUAL_RE = re.compile(r"([.#][-\w]+|\[[-\w]+(?:[\^$]?=[^\]]*)?\])")


def _parse_simple(token: str):
    m = _SIMPLE_RE.fullmatch(token)
    if not m:
        raise ValueError(f"unsupported selector: {token!r}")
    tag = m.group("tag")
    classes, ids, attrs = [], [], []
    for q in _QUAL_RE.findall(m.group("quals") or ""):
        if q.startswith("."):
            classes.append(q[1:])
        elif q.startswith("#"):
            ids.append(q[1:])
        else:
            body = q[1:-1]
            if "^=" in body:
                k, v = body.split("^=", 1)
                attrs.append((k, ("^", v.strip("'\""))))
            elif "$=" in body:
                k, v = body.split("$=", 1)
                attrs.append((k, ("$", v.strip("'\""))))
            elif "=" in body:
                k, v = body.split("=", 1)
                attrs.append((k, ("=", v.strip("'\""))))
            else:
                attrs.append((body, None))
    return (None if tag in (None, "*") else tag.lower(), classes, ids, attrs)


def _parse_selector(css: str):
    """-> list of groups; each group is a list of (combinator, simple)."""
    groups = []
    for part in css.split(","):
        part = part.strip()
        if not part:
            continue
        tokens = part.replace(">", " > ").split()
        chain = []
        comb = " "
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            chain.append((comb, _parse_simple(tok)))
            comb = " "
        groups.append(chain)
    return groups


def _match_simple(el: Element, simple) -> bool:
    tag, classes, ids, attrs = simple
    if tag is not None and el.tag != tag:
        return False
    if any(c not in el.classes for c in classes):
        return False
    if any(el.attrs.get("id") != i for i in ids):
        return False
    for k, v in attrs:
        if k not in el.attrs:
            return False
        if v is not None:
            op, want = v
            have = el.attrs[k]
            if op == "=" and have != want:
                return False
            if op == "^" and not have.startswith(want):
                return False
            if op == "$" and not have.endswith(want):
                return False
    return True


def _matches_chain(el: Element, chain, scope: Element) -> bool:
    """Match chain right-to-left walking ancestors, bounded by scope."""
    comb, simple = chain[-1]
    if not _match_simple(el, simple):
        return False
    rest = chain[:-1]
    if not rest:
        return True
    node = el.parent
    if comb == ">":
        return node is not None and node is not scope.parent and _matches_chain(
            node, rest, scope
        )
    while node is not None and node is not scope.parent:
        if _matches_chain(node, rest, scope):
            return True
        node = node.parent
    return False
