"""Exact-substring span dedup (registry `substring_span_dedup`):
sliding 8-token-window duplicate coverage per doc (Lee et al. 2022's
suffix-array criterion at fixed granularity k=8). These tests pin the
interval-union semantics on planted corpora, plus a DuckDB recompute of
the registered oracle SQL on the same tiny table."""

from __future__ import annotations

import duckdb
import pytest

from webcollector_spark.plans import queries as q

K = 8


def _docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _run(spark, d):
    out = q.Q["substring_span_dedup"](spark, d)
    return {r["doc_id"]: r for r in out.collect()}


def _tok(prefix, n):
    return " ".join(f"{prefix}{i:03d}" for i in range(n))


def test_cross_doc_shared_run_covered_exactly(spark, tmp_path):
    # docs 0 and 1 share a 12-token run, flanked by doc-unique filler:
    # the 5 duplicated windows (12 - 8 + 1) union to exactly 12 tokens.
    shared = _tok("sh", 12)
    d = _docs(
        spark,
        tmp_path,
        [
            _tok("a", 10) + " " + shared + " " + _tok("b", 10),
            _tok("c", 10) + " " + shared + " " + _tok("d", 10),
            _tok("e", 30),  # fully unique
        ],
    )
    rows = _run(spark, d)
    assert rows[0]["n_tokens"] == 32 and rows[0]["dup_tokens"] == 12
    assert rows[1]["dup_tokens"] == 12
    assert rows[2]["dup_tokens"] == 0 and rows[2]["dup_ratio"] == 0.0
    assert rows[0]["dup_ratio"] == round(12 / 32, 4)


def test_intra_doc_repeat_counts_both_occurrences(spark, tmp_path):
    # one doc repeats the same 8-token phrase twice (disjoint): both
    # occurrences are duplicated spans -> 16 covered tokens.
    phrase = _tok("p", K)
    d = _docs(
        spark,
        tmp_path,
        [_tok("x", 9) + " " + phrase + " " + _tok("y", 9) + " " + phrase],
    )
    rows = _run(spark, d)
    assert rows[0]["n_tokens"] == 9 + K + 9 + K
    assert rows[0]["dup_tokens"] == 2 * K


def test_overlapping_windows_union_not_sum(spark, tmp_path):
    # two identical docs: EVERY window is duplicated; coverage must be
    # the doc length (interval union), not windows * k.
    text = _tok("t", 20)
    d = _docs(spark, tmp_path, [text, text])
    rows = _run(spark, d)
    assert rows[0]["dup_tokens"] == 20 and rows[1]["dup_tokens"] == 20
    assert rows[0]["dup_ratio"] == 1.0


def test_short_docs_emit_zero_rows_not_dropped(spark, tmp_path):
    d = _docs(spark, tmp_path, ["one two three", _tok("z", 40)])
    rows = _run(spark, d)
    assert rows[0]["n_tokens"] == 3 and rows[0]["dup_tokens"] == 0
    assert rows[1]["dup_tokens"] == 0


@pytest.mark.usefixtures("spark")
def test_duckdb_oracle_agrees_on_planted_corpus(spark, tmp_path):
    shared = _tok("sh", 15)
    d = _docs(
        spark,
        tmp_path,
        [
            _tok("a", 5) + " " + shared,
            shared + " " + _tok("b", 5),
            _tok("c", 3),
            _tok("dd", 25) + " " + _tok("dd", 6),  # intra-doc prefix repeat
        ],
    )
    got = {
        (r["doc_id"], r["n_tokens"], r["dup_tokens"], r["dup_ratio"])
        for r in _run(spark, d).values()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = set(
        con.execute(
            q.SQL["substring_span_dedup"]
        ).fetchall()
    )
    want = {(a, b, c, float(r)) for a, b, c, r in want}
    assert got == want


# ---------------------------------------------------------------------------
# True length-unbounded ExactSubstr spans (registry `exact_substr_spans`,
# VERDICT r4 item 4): the maximal duplicated intervals themselves, via
# the exact two-pass fixed-k->extend form at the paper's L=50 (here
# exercised through the reusable helper at smaller L for fixtures).


def _spans(spark, d, L):
    from webcollector_spark.plans.queries import exact_substr_spans

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in exact_substr_spans(docs, L).collect()
    )


def test_64_token_duplicated_span_is_one_unbounded_span(spark, tmp_path):
    """A >= 64-token duplicated region must come out as ONE maximal
    span of its full length — not fixed-size chunks (the done-criterion
    fixture from VERDICT r4 item 4)."""
    shared = _tok("sh", 100)  # 100-token duplicated region
    d = _docs(
        spark,
        tmp_path,
        [
            _tok("a", 7) + " " + shared + " " + _tok("b", 9),
            _tok("c", 11) + " " + shared,
            _tok("e", 120),  # long but unique: no spans
        ],
    )
    assert _spans(spark, d, 64) == [(0, 7, 100), (1, 11, 100)]


def test_two_separate_spans_stay_separate(spark, tmp_path):
    s1, s2 = _tok("x", 70), _tok("y", 80)
    d = _docs(
        spark,
        tmp_path,
        [
            s1 + " " + _tok("gap", 40) + " " + s2,
            s1 + " " + _tok("other", 55) + " " + s2,
        ],
    )
    assert _spans(spark, d, 64) == [
        (0, 0, 70),
        (0, 110, 80),
        (1, 0, 70),
        (1, 125, 80),
    ]


def test_span_len_sums_match_substring_span_dedup_contract(spark, tmp_path):
    """VERDICT done-criterion: at the SAME k, the unbounded-span op's
    per-doc span_len totals must equal substring_span_dedup's
    dup_tokens — they compute the same coverage, one as intervals, one
    as counts."""
    shared = _tok("sh", 15)
    d = _docs(
        spark,
        tmp_path,
        [
            _tok("a", 5) + " " + shared,
            shared + " " + _tok("b", 5),
            _tok("c", 3),
            _tok("dd", 25) + " " + _tok("dd", 6),
            _tok("p", K) + " " + _tok("q", 9) + " " + _tok("p", K),
        ],
    )
    cov = {i: r["dup_tokens"] for i, r in _run(spark, d).items()}
    totals: dict[int, int] = {i: 0 for i in cov}
    for doc_id, _start, length in _spans(spark, d, K):
        totals[doc_id] += length
    assert totals == cov


def test_exact_substr_duckdb_oracle_agrees(spark, tmp_path):
    """Registered L=50 form vs its DuckDB oracle on a planted corpus
    holding a 60-token cross-doc span and an 80-token intra-doc
    repeat."""
    shared = _tok("sh", 60)
    rep = _tok("r", 80)
    d = _docs(
        spark,
        tmp_path,
        [
            shared + " " + _tok("a", 20),
            _tok("b", 30) + " " + shared,
            rep + " " + _tok("mid", 10) + " " + rep,
            _tok("u", 90),
        ],
    )
    got = set(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in q.Q["exact_substr_spans"](spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = set(map(tuple, con.execute(q.SQL["exact_substr_spans"]).fetchall()))
    assert got == want
    assert (0, 0, 60) in got and (1, 30, 60) in got
    assert (2, 0, 80) in got and (2, 90, 80) in got


# ---------------------------------------------------------------------------
# Independent suffix-array oracle for exact_substr_spans: Lee et al.
# 2022's actual construction (sorted suffix array + adjacent-LCP), no
# windows, no hashing — a position is duplicated iff the longest
# duplicated prefix of SOME suffix covering it reaches L.


def _sa_spans(texts, L):
    import re as _re

    docs = [
        [w for w in _re.split(r"\s+", t.lower()) if w] for t in texts
    ]
    suffixes = [
        (d, i) for d, toks in enumerate(docs) for i in range(len(toks))
    ]
    suffixes.sort(key=lambda s: docs[s[0]][s[1] :])

    def lcp(a, b):
        ta, tb = docs[a[0]][a[1] :], docs[b[0]][b[1] :]
        n = 0
        for x, y in zip(ta, tb):
            if x != y:
                break
            n += 1
        return n

    # longest duplicated prefix per suffix = max LCP with a sorted
    # neighbor (the classic suffix-array property)
    dup_len = {}
    for j, s in enumerate(suffixes):
        m = 0
        if j > 0:
            m = max(m, lcp(suffixes[j - 1], s))
        if j + 1 < len(suffixes):
            m = max(m, lcp(s, suffixes[j + 1]))
        dup_len[s] = m
    # coverage: window [i, i+L) for every suffix with dup prefix >= L,
    # unioned into maximal per-doc intervals
    spans = []
    for d in range(len(docs)):
        marks = sorted(
            i for (dd, i), m in dup_len.items() if dd == d and m >= L
        )
        cur = None
        for i in marks:
            if cur and i <= cur[1]:
                cur[1] = max(cur[1], i + L)
            else:
                if cur:
                    spans.append((d, cur[0], cur[1] - cur[0]))
                cur = [i, i + L]
        if cur:
            spans.append((d, cur[0], cur[1] - cur[0]))
    return sorted(spans)


def test_suffix_array_oracle_agrees_on_planted_corpus(spark, tmp_path):
    shared = _tok("sh", 60)
    rep = _tok("r", 80)
    texts = [
        shared + " " + _tok("a", 20),
        _tok("b", 30) + " " + shared,
        rep + " " + _tok("mid", 10) + " " + rep,
        _tok("u", 90),
        _tok("p", 25) + " " + shared + " " + _tok("q", 5) + " " + shared,
    ]
    d = _docs(spark, tmp_path, texts)
    assert _spans(spark, d, 50) == _sa_spans(texts, 50)


def test_suffix_array_oracle_agrees_on_random_corpora(spark, tmp_path):
    """Randomized cross-check over a small alphabet (forces heavy
    accidental repetition): the window/hash construction must equal the
    true suffix-array computation on every seed."""
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        texts = [
            " ".join(rng.choice("ab cd ef gh".split()) for _ in range(60))
            for _ in range(6)
        ]
        d = _docs(spark, tmp_path / f"s{seed}", texts)
        for L in (4, 8):
            assert _spans(spark, d, L) == _sa_spans(texts, L), (seed, L)
