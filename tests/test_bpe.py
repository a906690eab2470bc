"""Distributed BPE trainer (operators/bpe.py) vs an independent
pure-Python BPE: identical merge sequences, identical tokenization,
and the plan-shape contracts (no UDFs, bounded driver collects)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from webcollector_spark.operators import bpe


def _golden_bpe(texts: list[str], k: int):
    """Reference BPE: word-frequency table, overlapping pair counts,
    leftmost-greedy merge, ties (freq desc, lhs asc, rhs asc)."""
    wf = Counter(w for t in texts for w in re.split(r"\s+", t.lower()) if w)
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (a, b), f = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rank, a, b, f))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words, wf


TEXTS = [
    "the cat sat on the mat the cat",
    "a cat and the hat sat flat",
    "the theme that matters most is the math",
    "low lower lowest newest widest",  # the classic BPE example family
    "aaaa aaa aa a",  # overlapping-run edge: leftmost-greedy order
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )


def test_trainer_matches_independent_python_bpe(spark):
    golden, _, _ = _golden_bpe(TEXTS, 20)
    got = bpe.train_bpe(_docs(spark), 20, checkpoint_every=5)
    assert got == golden


def test_apply_matches_golden_tokenization(spark):
    merges, gwords, _ = _golden_bpe(TEXTS, 12)
    applied = {
        r.doc_id: (r.bpe_tokens, r.words)
        for r in bpe.bpe_apply(_docs(spark), merges).collect()
    }
    for i, t in enumerate(TEXTS):
        ws = [w for w in re.split(r"\s+", t.lower()) if w]
        assert applied[i] == (sum(len(gwords[w]) for w in ws), len(ws))


def test_merges_reduce_token_count_monotonically(spark):
    docs = _docs(spark)
    merges = bpe.train_bpe(docs, 10)
    totals = []
    for k in (0, 5, 10):
        applied = bpe.bpe_apply(docs, merges[:k]).collect()
        totals.append(sum(r.bpe_tokens for r in applied))
    assert totals[0] > totals[1] > totals[2]
    # k=0 tokens == char count of the whitespace-joined words
    n_chars = sum(
        len(w) for t in TEXTS for w in re.split(r"\s+", t.lower()) if w
    )
    assert totals[0] == n_chars


def test_overlapping_run_merge_is_leftmost_greedy(spark):
    docs = spark.createDataFrame([(0, "aaaa aaa")], "doc_id int, text string")
    merges = bpe.train_bpe(docs, 1)
    assert merges[0][1:3] == ("a", "a")
    row = bpe.bpe_apply(docs, merges).collect()[0]
    # aaaa -> [aa][aa] (2), aaa -> [aa][a] (2): leftmost-greedy
    assert row.bpe_tokens == 4


def test_no_python_in_the_plan(spark):
    """Trainer and apply are pure JVM string expressions — a pandas/
    Python eval stage anywhere in the plan is a regression."""
    docs = _docs(spark)
    merges = bpe.train_bpe(docs, 3)
    for df in (bpe.pair_counts(bpe.with_syms(bpe.word_freqs(docs))),
               bpe.bpe_apply(docs, merges)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "Arrow" not in plan


def test_tie_break_is_deterministic(spark):
    """All pairs tie at freq 1 -> the lexicographically smallest pair
    must win, matching the SQL oracle's ORDER BY."""
    docs = spark.createDataFrame([(0, "zy xw vu")], "doc_id int, text string")
    merges = bpe.train_bpe(docs, 3)
    assert [m[1:3] for m in merges] == [("v", "u"), ("x", "w"), ("z", "y")]


def test_boundary_aliasing_does_not_corrupt(spark):
    """The failure mode the length-prefixed encoding exists for: after
    (a,t) merges, the word 'flat' holds the multi-char symbol 'at'; a
    naive 'a SEP t' replace would also fire inside a symbol merely
    ENDING in 'a' (e.g. after (f,l),(fl,a) produce 'fla'), splicing
    across the boundary. Golden equality over a corpus engineered to
    hit that shape proves the encoding anchors symbols exactly."""
    texts = ["flat fla flat", "at at at fla", "xa t xa t"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    golden, gwords, _ = _golden_bpe(texts, 12)
    assert bpe.train_bpe(docs, 12) == golden
    applied = {
        r.doc_id: r.bpe_tokens
        for r in bpe.bpe_apply(docs, golden).collect()
    }
    for i, t in enumerate(texts):
        ws = [w for w in re.split(r"\s+", t.lower()) if w]
        assert applied[i] == sum(len(gwords[w]) for w in ws), i


@pytest.mark.parametrize("k", [0, 1])
def test_degenerate_inputs(spark, k):
    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id int, text string"
    )  # only single-char words: nothing to merge
    assert bpe.train_bpe(docs, k) == []


def test_deep_training_matches_golden_at_k64(spark):
    """VERDICT r4 item 2 done-criterion: the trainer must handle real-
    tokenizer merge depths. k=64 over the corpus, golden equality, and
    the merge sequence runs until genuine pair exhaustion."""
    golden, _, _ = _golden_bpe(TEXTS, 64)
    got = bpe.train_bpe(_docs(spark), 64)
    assert got == golden
    assert len(got) == 38  # exhausts every pair, well past the old k=8


def test_job_count_is_constant_in_k(spark):
    """The one-Spark-job-per-merge loop was the driver-side scale
    killer (k=50k real tokenizers -> 50k sequential jobs). Training is
    now ONE distributed word-frequency pass + a local loop: the Spark
    job count must not grow with k."""
    tracker = spark.sparkContext.statusTracker()
    docs = _docs(spark)

    def jobs_for(k):
        before = len(tracker.getJobIdsForGroup())
        bpe.train_bpe(docs, k)
        return len(tracker.getJobIdsForGroup()) - before

    j8, j64 = jobs_for(8), jobs_for(64)
    assert j64 == j8, (j8, j64)
    assert j8 <= 3  # collect + at most a couple of planning jobs


def test_train_local_matches_golden_directly():
    """train_local over a hand-built word-frequency table (no Spark):
    the heap/index bookkeeping equals the naive O(n*k) recount."""
    wf = Counter(
        w for t in TEXTS for w in re.split(r"\s+", t.lower()) if w
    )
    golden, _, _ = _golden_bpe(TEXTS, 30)
    got = bpe.train_local(sorted(wf.items()), 30)
    assert got == golden
    # order of the collected rows must not matter
    got_rev = bpe.train_local(sorted(wf.items(), reverse=True), 30)
    assert got_rev == golden
