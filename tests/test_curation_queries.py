"""Unit tests for the round-4 curation/scheduler additions: BM25
ranked retrieval, CCNet perplexity buckets, UCB host priority,
fetch-latency percentiles, and registrable-domain extraction.

The registry twins are oracle-checked end to end by
tools/check_oracle.py; these tests pin the SEMANTICS on hand-built
inputs where the expected values are derivable by hand."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from webcollector_spark.operators.rank import ucb_host_scores


def test_ucb_exploration_bonus_favors_unsampled_host(spark):
    # host a: 9 pulls 3 yields; host b: 1 pull 0 yields. UCB must rank
    # the barely-sampled b above the well-known a despite b's 0 mean.
    rows = [("a", i % 3 == 0) for i in range(9)] + [("b", False)]
    df = spark.createDataFrame(rows, "host string, yielded boolean")
    got = {r["host"]: r for r in ucb_host_scores(df, c=2.0).collect()}
    t = 10.0
    exp_a = 3 / 9 + math.sqrt(2.0 * math.log(t) / 9)
    exp_b = 0 / 1 + math.sqrt(2.0 * math.log(t) / 1)
    assert abs(got["a"]["ucb"] - exp_a) < 1e-9
    assert abs(got["b"]["ucb"] - exp_b) < 1e-9
    assert got["b"]["ucb"] > got["a"]["ucb"]
    assert (got["a"]["n_trials"], got["a"]["n_yield"]) == (9, 3)


def test_ucb_bonus_decays_with_trials(spark):
    # same mean yield, 4x the trials -> strictly lower score (the bonus
    # halves: sqrt(ln t / n) with n -> 4n).
    rows = (
        [("few", i % 2 == 0) for i in range(4)]
        + [("many", i % 2 == 0) for i in range(16)]
    )
    df = spark.createDataFrame(rows, "host string, yielded boolean")
    got = {r["host"]: r["ucb"] for r in ucb_host_scores(df).collect()}
    assert got["few"] > got["many"]


def test_bm25_ranks_matching_doc_above_nonmatching(spark, tmp_path):
    # 3-doc corpus: doc 0 is stuffed with the query term 'join', doc 1
    # mentions it once in a long doc, doc 2 not at all. BM25 order must
    # be 0 > 1, and 2 absent (no query term -> no score row).
    from webcollector_spark.plans.queries import q_bm25_rank

    docs = spark.createDataFrame(
        [
            (0, "join join join vector", "en", "s", 21),
            (1, "stream " + "pad " * 40 + "join", "en", "s", 200),
            (2, "hash scan filter", "en", "s", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = q_bm25_rank(spark, str(tmp_path)).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 0 and 1 in ids and 2 not in ids
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert scores[0] > scores[1] > 0


def test_perplexity_buckets_split_within_language(spark, tmp_path):
    # 6 en docs of 3 distinct unigram profiles -> tertiles must put the
    # common-token docs in 'head' and the rare-token docs in 'tail';
    # the lone zh doc gets its own per-language window (bucket 'head'
    # regardless of its entropy relative to en).
    from webcollector_spark.plans.queries import q_perplexity_bucket

    common, rare = "the the the the", "zyx wvu tsr qpo"
    rows = [
        (0, common, "en"), (1, common, "en"),
        (2, common + " mid", "en"), (3, common + " mix", "en"),
        (4, rare, "en"), (5, rare + " qq", "en"),
        (6, "unico documento", "zh"),
    ]
    docs = spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in q_perplexity_bucket(spark, str(tmp_path)).collect()}
    assert got[0]["bucket"] == "head" and got[1]["bucket"] == "head"
    assert got[4]["bucket"] == "tail" or got[5]["bucket"] == "tail"
    assert got[6]["bucket"] == "head"  # sole doc in its language
    # head docs have strictly lower cross-entropy than tail docs (en)
    assert got[0]["cross_ent"] < got[4]["cross_ent"]


def test_registrable_domain_collapses_subdomains(spark, tmp_path):
    # www./img.cdn. subdomains of one registrable domain roll up
    # together; co.uk keeps three labels, com keeps two.
    from webcollector_spark.plans.queries import q_registrable_domain_rollup

    docs = spark.createDataFrame(
        [
            (0, "t", "en", "ex", 1),   # www.ex.com
            (1, "t", "en", "ex", 1),   # img.cdn.ex.co.uk
            (2, "t", "en", "ex", 1),   # www.ex.org
            (4, "t", "en", "ex", 1),   # www.ex.com (again)
            (5, "t", "en", "ex", 1),   # img.cdn.ex.co.uk (again)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["domain"]: r
        for r in q_registrable_domain_rollup(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"ex.com", "ex.co.uk", "ex.org"}
    assert got["ex.com"]["n_docs"] == 2 and got["ex.com"]["n_hosts"] == 1
    assert got["ex.co.uk"]["n_docs"] == 2  # 2-level suffix kept 3 labels


def test_latency_percentiles_interpolate_like_quantile_cont(spark):
    # 4 samples on one host: p50 at rank 1.5 -> 2.5, p95 at rank 2.85
    # -> 3 + 0.85*(10-3) = 8.95 (linear interpolation, the
    # quantile_cont convention the oracle uses).
    from webcollector_spark.plans.queries import Q

    df = spark.createDataFrame(
        [(i, None, 7, "view", v, None) for i, v in enumerate([1.0, 2.0, 3.0, 10.0])],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = (
        df.groupBy(F.col("user_id").alias("host"))
        .agg(
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95"),
        )
        .collect()[0]
    )
    assert out["p50"] == 2.5
    assert out["p95"] == 8.95
    assert "host_fetch_latency" in Q


def test_kn_bigram_logprob_matches_straightline_python(spark):
    """The interpolated Kneser-Ney bigram scorer vs an independent
    pure-Python recompute: per-doc average log-prob equal to 4
    decimals, every per-context conditional distribution sums to 1
    (the property KN smoothing exists to preserve), and the vocabulary
    tables are never broadcast."""
    import math
    from collections import Counter, defaultdict

    from webcollector_spark.plans.queries import Q

    texts = [
        "the cat sat on the mat",
        "the cat ate the hat",
        "a dog sat on a log",
        "the dog and the cat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )

    import webcollector_spark.plans.queries as qmod

    orig = qmod._t
    qmod._t = lambda s, sf, name: docs  # route the registry fn at our table
    try:
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logp_kn)
            for r in Q["kn_bigram_logprob"](spark, "unused").collect()
        }
    finally:
        qmod._t = orig

    D = 0.75
    bigrams = []
    per_doc = defaultdict(list)
    for i, t in enumerate(texts):
        toks = ["<s>"] + t.split()
        for a, b in zip(toks, toks[1:]):
            bigrams.append((a, b))
            per_doc[i].append((a, b))
    c12 = Counter(bigrams)
    c1 = Counter()
    fwd = defaultdict(set)
    back = defaultdict(set)
    for (a, b), c in c12.items():
        c1[a] += c
        fwd[a].add(b)
        back[b].add(a)
    n_types = len(c12)

    def p_kn(a, b):
        return max(c12[(a, b)] - D, 0) / c1[a] + (
            D * len(fwd[a]) / c1[a]
        ) * (len(back[b]) / n_types)

    for i in per_doc:
        logs = [math.log(p_kn(a, b)) for a, b in per_doc[i]]
        assert got[i] == (len(logs), round(sum(logs) / len(logs), 4)), i

    # the KN conditional must be a proper distribution per context:
    # summing over every OBSERVED w2 (continuation mass covers exactly
    # the observed vocabulary here since scoring == training corpus)
    vocab = {b for _, b in bigrams}
    for a in c1:
        assert abs(sum(p_kn(a, b) for b in vocab) - 1.0) < 1e-9, a


def test_kn_bigram_plan_never_broadcasts_vocab(spark):
    """The count-table joins must be plain shuffle joins at scale — the
    explicit-broadcast is only the 1-row totals frame. At sf sizes AQE
    may still pick broadcast physically; what we pin is that the PLAN
    carries no user broadcast hint on the O(vocab) frames."""
    from webcollector_spark.plans.queries import Q

    df = Q["kn_bigram_logprob"](spark, "/root/testdata/sf0.001")
    logical = df._jdf.queryExecution().logical().toString()
    # exactly one user hint: the 1-row totals broadcast
    assert logical.count("UnresolvedHint broadcast") <= 1
