"""Zipfian mega-cluster evidence for the conflict operators: on a real
crawl the same boilerplate image (logo, spacer, stock photo) recurs
10^4-10^7 times with assorted alt-text. `caption_conflict`'s PAIR LIST
is then output-bound at C(g,2) per cluster — the contract, not join
waste — while the per-image FLAG (`caption_conflict_flags`) aggregates
per cluster and stays O(n + candidates).

This bench plants one mega-cluster of size g inside a 500k-row corpus
(rest = the 4-row clusters of caption_scale_bench) and reports, at two
g values:

* the conflicting-pair count, computed ANALYTICALLY per cluster
  (pairs = C(cnt,2) - sum_cap C(cnt_cap,2) — one aggregate, exact, no
  enumeration) — it must grow ~quadratically in g;
* the flag wall time — it must stay flat;
* the pair-LIST wall time at the small g only, as the cost anchor: a
  first attempt timed the list at g=40k inside a 1M corpus and a
  single repetition ran for tens of minutes (the mega-cluster's ~8e8
  pairs materialize inside one task), which is exactly the behavior
  the flag operator exists to avoid.

Usage: python tools/zipf_bench.py  (writes BENCH_ZIPF.json)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 500_000
MEGA = (4_000, 16_000)


def synth_zipf(spark, n: int, g: int):
    from pyspark.sql import functions as F

    # rows [0, g): one exact-dup mega-cluster, two disagreeing captions
    # (the "logo with two alt-texts" shape); rest: caption-UNANIMOUS
    # 4-row clusters, so the conflict signal (pairs AND flags) isolates
    # the mega-cluster
    mega = F.col("id") < g
    base = F.xxhash64((F.col("id") / 4).cast("long"))
    return spark.range(n).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.when(mega, F.lit(0).cast("long")).otherwise(base).alias("phash"),
        F.when(mega & (F.col("id") % 2 == 0), F.lit("image"))
        .when(mega, F.lit("photo"))
        .otherwise(F.concat(F.lit("caption of cluster "),
                            (F.col("id") / 4).cast("long")))
        .alias("caption"),
    )


def exact_dup_conflict_pairs(meta) -> int:
    """Hamming-0 conflicting-pair count, analytically: per phash
    cluster, all pairs minus same-caption pairs. (Cross-hash pairs are
    corpus-dependent and negligible here — xxhash64 values collide
    within hamming 4 with probability ~C(64,<=4)/2^64.)"""
    from pyspark.sql import functions as F

    per_cap = meta.groupBy("phash", "caption").agg(F.count("*").alias("c"))
    row = (
        per_cap.groupBy("phash")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("same"),
        )
        .agg(
            F.sum(
                F.col("n") * (F.col("n") - 1) / 2 - F.col("same")
            ).alias("p")
        )
        .collect()[0]
    )
    return int(row["p"])


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from webcollector_spark.operators import captions
    from webcollector_spark.session import get_spark

    spark = get_spark("zipf-bench", cores=32, shuffle_partitions=32)

    def timed(fn, reps=3):
        fn()  # untimed warm
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        return round(sorted(samples)[len(samples) // 2], 3)

    out = {"n": N, "mega_sizes": {}}
    for g in MEGA:
        meta = synth_zipf(spark, N, g).persist(StorageLevel.MEMORY_AND_DISK)
        meta.count()
        flags = captions.caption_conflict_flags(meta, max_hamming=4).filter(
            F.col("conflicted")
        )
        row = {
            "conflict_pairs_analytic": exact_dup_conflict_pairs(meta),
            "flags_sec": timed(lambda: flags.count()),
            "flagged_images": flags.count(),
        }
        if g == MEGA[0]:
            # pair-list cost anchor at the small g only (see module doc)
            pairs = captions.caption_conflict(meta, max_hamming=4)
            row["pairlist_sec"] = timed(lambda: pairs.count(), reps=1)
            row["pairlist_rows"] = pairs.count()
        out["mega_sizes"][str(g)] = row
        print(f"# g={g}: {row}", file=sys.stderr)
        meta.unpersist()

    g1 = out["mega_sizes"][str(MEGA[0])]
    g2 = out["mega_sizes"][str(MEGA[1])]
    out["pair_growth"] = round(
        g2["conflict_pairs_analytic"] / max(1, g1["conflict_pairs_analytic"]), 2
    )
    out["flag_time_ratio"] = round(g2["flags_sec"] / max(0.001, g1["flags_sec"]), 2)
    Path("BENCH_ZIPF.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
