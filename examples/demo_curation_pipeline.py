"""End-to-end training-data curation pipeline over the documents table —
the workflow a pretraining-data team runs after the crawl lands:

    normalize -> quality filter (C4-style + Gopher repetition) ->
    exact dedup -> MinHash-LSH near-dup -> connected components ->
    one keeper per duplicate cluster -> leakage-free train/val/test split

Every stage is a registry operator (plans/queries.py) composed on real
DataFrames, so each piece is independently DuckDB-oracled; this demo
chains them and prints the funnel. No Python UDF anywhere — the whole
pipeline is JVM expressions + shuffles that scale by partition count.

    python examples/demo_curation_pipeline.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from webcollector_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-curation", cores=8, shuffle_partitions=8)
    from webcollector_spark.plans import queries as qmod

    Q = qmod.queries()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality gates: composite C4-ish rule set + repetition signals
    kept_q = Q["quality_filter_c4"](spark, sf).filter(F.col("keep")).select("doc_id")
    rep = Q["gopher_repetition"](spark, sf)
    kept_rep = rep.filter(
        (F.col("top_bigram_frac") <= 0.20) & (F.col("dup_word_frac") <= 0.90)
    ).select("doc_id")
    survivors = kept_q.join(kept_rep, "doc_id")
    n1 = survivors.count()
    print(f"after quality + repetition gates: {n1} ({n0 - n1} dropped)")

    # 2. exact dedup on the normalized-text fingerprint (first id wins)
    norm = Q["text_normalize"](spark, sf).join(survivors, "doc_id")
    exact_keep = (
        norm.groupBy("norm_md5").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    n2 = exact_keep.count()
    print(f"after exact dedup: {n2} ({n1 - n2} exact dupes)")

    # 3. near-dup: LSH candidate pairs -> connected components -> one
    # keeper per cluster, RE-ELECTED within the surviving set (the
    # full-corpus keeper may itself have been dropped by the quality or
    # exact-dedup gates — its cluster must still contribute one doc)
    clusters = Q["dedup_cluster_keepers"](spark, sf).select("doc_id", "cluster")
    final = (
        clusters.join(exact_keep, "doc_id")
        .groupBy("cluster")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    n3 = final.count()
    print(f"after near-dup clustering: {n3} ({n2 - n3} near dupes)")

    # 4. span-level duplication audit (r5): the TRUE ExactSubstr form —
    # maximal duplicated intervals (length-unbounded) still present in
    # the survivor set; a production run rewrites or drops these spans
    spans = Q["exact_substr_spans"](spark, sf).join(final, "doc_id")
    audit = spans.agg(
        F.count("*").alias("spans"),
        F.coalesce(F.sum("span_len"), F.lit(0)).alias("dup_tokens"),
        F.coalesce(F.max("span_len"), F.lit(0)).alias("longest"),
    ).collect()[0]
    print(
        f"residual duplicated spans (>=50 tokens) among survivors: "
        f"{audit.spans} spans, {audit.dup_tokens} tokens, "
        f"longest {audit.longest}"
    )

    # 5. tokenizer fit (r5): tokens per doc under the learned BPE
    # merges — the compression the tokenizer buys on the curated set
    toks = Q["bpe_token_counts"](spark, sf).join(final, "doc_id")
    fit = toks.agg(
        F.sum("bpe_tokens").alias("bpe"), F.sum("words").alias("words")
    ).collect()[0]
    print(
        f"BPE tokenization over survivors: {fit.bpe} tokens for "
        f"{fit.words} words ({fit.bpe / max(fit.words, 1):.2f} tok/word)"
    )

    # 6. deterministic split assignment on the surviving set
    split = Q["train_val_split"](spark, sf)
    print("split sizes over the full corpus (stable identity hash):")
    split.orderBy("split").show()

    # funnel summary
    print(
        f"funnel: {n0} -> quality {n1} -> exact {n2} -> near-dup {n3} "
        f"({100.0 * n3 / n0:.1f}% retained)"
    )


if __name__ == "__main__":
    main()
