"""RegexRule — positive/negative URL rule sets.

Reference: util/RegexRule.java:67-81 (add with "+re"/"-re" prefixes,
bare rule = positive) and :112-133 (satisfy: must match >=1 positive —
vacuously true when no positives — and 0 negatives).

Two forms:
* `RegexRule` — plain-Python (used inside Arrow UDF batches, and by the
  oracle replay).
* `rule_column` — a Catalyst boolean Column (rlike AND NOT rlike), for
  declarative filtering of an exploded links DataFrame so the filter
  stays JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class RegexRule:
    def __init__(self, rules: list[str] | None = None):
        self.positive: list[re.Pattern] = []
        self.negative: list[re.Pattern] = []
        for r in rules or []:
            self.add(r)

    def add(self, rule: str) -> "RegexRule":
        # "+x" positive, "-x" negative, bare = positive (RegexRule.java:67-81)
        if rule.startswith("+"):
            self.positive.append(re.compile(rule[1:]))
        elif rule.startswith("-"):
            self.negative.append(re.compile(rule[1:]))
        else:
            self.positive.append(re.compile(rule))
        return self

    def is_empty(self) -> bool:
        return not self.positive and not self.negative

    def satisfy(self, s: str) -> bool:
        # Java Matcher.matches() is full-string — mirror with fullmatch.
        if any(p.fullmatch(s) for p in self.negative):
            return False
        if not self.positive:
            return True
        return any(p.fullmatch(s) for p in self.positive)


def rule_column(col: Column, rules: list[str]) -> Column:
    """Catalyst equivalent of RegexRule.satisfy over a string column.
    rlike is substring-match; anchor to mirror Java matches()."""
    pos, neg = [], []
    for r in rules:
        if r.startswith("+"):
            pos.append(r[1:])
        elif r.startswith("-"):
            neg.append(r[1:])
        else:
            pos.append(r)

    def anchor(p: str) -> str:
        return f"^(?:{p})$"

    cond = F.lit(True)
    if pos:
        pos_any = F.lit(False)
        for p in pos:
            pos_any = pos_any | col.rlike(anchor(p))
        cond = cond & pos_any
    for n in neg:
        cond = cond & ~col.rlike(anchor(n))
    return cond
