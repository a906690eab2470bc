"""Distributed BPE tokenizer training — the tokenizer-side member of
the training-data pipeline (Sennrich et al. 2016, the HuggingFace /
SentencePiece-BPE shape).

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
one whitespace pre-tokenization pass folds 100 TB of text to O(distinct
words) rows (Zipf: millions, not trillions), and every merge iteration
then runs over that bounded table. Iteration k:

1. pair counts — explode each word's adjacent symbol pairs weighted by
   word frequency, one map-side-combinable aggregate (overlapping
   pairs counted per position, the HF convention);
2. argmax — orderBy(count desc, pair asc) limit 1, ONE row to the
   driver (the pagerank collect discipline: bounded, never O(data));
3. merge — a single JVM `replace` over the word's encoded symbol
   string; no Python touches the rows.

**Symbol encoding** (the part that makes blind string replace EXACT):
each symbol is stored as ``SEP len SEP chars`` (SEP = the 0x1F unit
separator, stripped from input words; len in decimal). The encoding is
self-delimiting, so a merge pattern ``enc(a)+enc(b)`` can never match
across a symbol boundary (a symbol merely *ending* in ``a`` does not
alias — its length prefix differs), and adjacent matches share no
characters, so leftmost non-overlapping `replace` IS BPE's
leftmost-greedy merge order — including runs like ``aaaa`` ->
``[aa][aa]``. A naive ``a SEP b`` pattern fails BOTH ways (boundary
aliasing and shared-separator overlap); tests/test_bpe.py pins the
failure cases.

Everything is whole-stage-codegen string/array expressions — no UDFs.
Lineage is cut with localCheckpoint every few merges (the pagerank
discipline). `bpe_apply` replays a learned merge list as k nested JVM
replaces — tokens per doc at 100 TB is a pure map stage.

Oracle story: the first K merges are ALSO expressible as K unrolled
SQL CTE blocks over the same encoding (the pagerank
unrolled-iterations precedent), so the registry rows are fully
hash-checked against DuckDB; tests additionally pin the trainer
against an independent pure-Python BPE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"


def enc_pattern(lhs: str, rhs: str) -> str:
    """The merge's search pattern: enc(lhs) + enc(rhs)."""
    return f"{SEP}{len(lhs)}{SEP}{lhs}{SEP}{len(rhs)}{SEP}{rhs}"


def enc_replacement(lhs: str, rhs: str) -> str:
    """The merge's replacement: enc(lhs + rhs)."""
    return f"{SEP}{len(lhs) + len(rhs)}{SEP}{lhs}{rhs}"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace pre-tokenization -> (word, freq). The ONE pass over
    the corpus; everything after is O(distinct words). Control chars
    (including SEP itself) are stripped so the encoding stays
    unambiguous on arbitrary input."""
    w = F.explode(
        F.split(
            F.regexp_replace(
                F.lower(F.col(text_col)), "[\\x00-\\x1f]", " "
            ),
            r"\s+",
        )
    ).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _enc_col(word: Column) -> Column:
    """word -> initial per-char encoded symbol string."""
    return F.array_join(
        F.transform(
            F.split(word, ""),
            lambda c: F.concat(F.lit(SEP + "1" + SEP), c),
        ),
        "",
    )


def sym_list(enc: Column) -> Column:
    """Encoded symbol string -> array<string> of symbols (the chars at
    even 0-based split positions >= 2; odd positions are lengths)."""
    return F.filter(
        F.split(enc, SEP), lambda x, i: (i % 2 == 0) & (i >= 2)
    )


def with_syms(words: DataFrame) -> DataFrame:
    return words.withColumn("syms", _enc_col(F.col("word")))


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word freq — map-side
    combinable, output O(distinct pairs)."""
    lst = sym_list(F.col("syms"))
    n = F.size(lst)
    pairs = F.arrays_zip(
        F.slice(lst, 1, n - 1).alias("lhs"),
        F.slice(lst, 2, n - 1).alias("rhs"),
    )
    return (
        words.filter(n > 1)
        .select(F.col("freq"), F.explode(pairs).alias("pr"))
        .groupBy(
            F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs")
        )
        .agg(F.sum("freq").alias("f"))
    )


def train_bpe(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    checkpoint_every: int = 6,
) -> list[tuple[int, str, str, int]]:
    """Learn the first k merges; returns [(rank, lhs, rhs, freq)].
    Ties break on (freq desc, lhs asc, rhs asc) so the sequence is
    engine- and parallelism-independent."""
    words = with_syms(word_freqs(docs, text_col)).select("syms", "freq")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        best = (
            pair_counts(words)
            .orderBy(F.desc("f"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, f = best[0].lhs, best[0].rhs, int(best[0].f)
        merges.append((rank, lhs, rhs, f))
        words = words.withColumn(
            "syms",
            F.replace(
                F.col("syms"),
                F.lit(enc_pattern(lhs, rhs)),
                F.lit(enc_replacement(lhs, rhs)),
            ),
        )
        if rank % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        [(r, a, b, a + b, f) for r, a, b, f in merges],
        "rank int, lhs string, rhs string, merged string, freq bigint",
    )


def bpe_apply(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokens per doc under the learned merges: per word, symbol count
    after replaying the merge chain (k nested JVM replaces — a pure
    map stage), summed per doc. No UDFs, no shuffle beyond the final
    per-doc aggregate."""
    wcol = F.explode(
        F.split(
            F.regexp_replace(
                F.lower(F.col(text_col)), "[\\x00-\\x1f]", " "
            ),
            r"\s+",
        )
    ).alias("word")
    exploded = docs.select(F.col(id_col), wcol).filter(F.col("word") != "")
    syms = _enc_col(F.col("word"))
    for _, lhs, rhs, _f in merges:
        syms = F.replace(
            syms, F.lit(enc_pattern(lhs, rhs)), F.lit(enc_replacement(lhs, rhs))
        )
    return (
        exploded.withColumn("n_toks", F.size(sym_list(syms)))
        .groupBy(id_col)
        .agg(
            F.sum("n_toks").alias("bpe_tokens"),
            F.count("*").alias("words"),
        )
    )
