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
