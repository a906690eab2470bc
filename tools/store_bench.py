"""Write-amplification evidence: CoW snapshot store vs the LSM
merge-on-read store over a many-round sequence on a frontier that is
much larger than each round — the regime where per-round O(frontier)
rewrites dominate a crawl's wall time (r01 verdict, perf note 3).

Shape: seed a FRONTIER_N-row frontier, then run ROUNDS merges of
ROUND_N-row segments (half fetch updates, half new links). The CoW
backend rewrites FRONTIER_N rows every round; the LSM backend writes
ROUND_N-row deltas and folds at read/compaction.

Usage: python tools/store_bench.py   (writes BENCH_STORE.json)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FRONTIER_N = 2_000_000
ROUND_N = 20_000
ROUNDS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from webcollector_spark.schema import FRONTIER_SCHEMA
    from webcollector_spark.session import get_spark
    from webcollector_spark.store import LsmParquetFrontierStore, ParquetFrontierStore

    spark = get_spark("store-bench", cores=32, shuffle_partitions=32)

    def rows(start, n, status=0, count=0, etime=None, depth=0):
        return spark.range(start, start + n).select(
            F.concat(F.lit("http://h/"), F.col("id")).alias("key"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.lit(status).alias("status"),
            F.lit(etime).cast("long").alias("execute_time"),
            F.lit(count).alias("execute_count"),
            F.lit(-1).alias("code"),
            F.lit(None).cast("string").alias("location"),
            F.lit(None).cast("map<string,string>").alias("meta"),
            F.concat(F.lit("h"), F.pmod("id", 64)).alias("host"),
            F.lit(depth).alias("depth"),
            F.lit(0.0).alias("priority"),
        )

    seeds = rows(0, FRONTIER_N)
    out = {"frontier_rows": FRONTIER_N, "round_rows": ROUND_N, "rounds": ROUNDS}

    def nocount(store):
        # disable the new-links metrics count (both backends pay a full
        # state fold for it) to isolate the WRITE path — the quantity
        # that differs by design: O(frontier) rewrite vs O(round) delta
        store.count = lambda: 0
        return store

    for name, mk in (
        ("cow", lambda p: ParquetFrontierStore(spark, p)),
        # inject consumes one delta slot, so no-compaction needs ROUNDS+2
        ("lsm", lambda p: LsmParquetFrontierStore(spark, p, compact_every=ROUNDS + 2)),
        ("lsm_compact4", lambda p: LsmParquetFrontierStore(spark, p, compact_every=4)),
        ("cow_nocount", lambda p: nocount(ParquetFrontierStore(spark, p))),
        (
            "lsm_nocount",
            lambda p: nocount(
                LsmParquetFrontierStore(spark, p, compact_every=ROUNDS + 2)
            ),
        ),
    ):
        path = f"/tmp/store_bench_{name}"
        shutil.rmtree(path, ignore_errors=True)
        store = mk(path)
        t0 = time.monotonic()
        store.inject(seeds)
        inject_sec = time.monotonic() - t0

        seen_files: set[str] = set()

        def new_bytes() -> int:
            # bytes written since last call = files not seen before; the
            # wall-clock barely differs on local NVMe/page-cache, but
            # written bytes is the quantity that scales with frontier
            # size (a 10^10-row frontier is ~400 GB per CoW rewrite)
            total = 0
            for f in Path(path).rglob("*"):
                if f.is_file() and str(f) not in seen_files:
                    seen_files.add(str(f))
                    total += f.stat().st_size
            return total

        new_bytes()  # baseline: the inject write
        t0 = time.monotonic()
        written = 0
        for r in range(ROUNDS):
            half = ROUND_N // 2
            fetched = rows(r * half, half, status=5, count=1, etime=1000 + r)
            links = rows(FRONTIER_N + r * half, half, depth=r + 1)
            store.merge(fetched, links)
            written += new_bytes()
        merge_sec = time.monotonic() - t0

        t0 = time.monotonic()
        n = store.load().count()
        read_sec = time.monotonic() - t0
        out[name] = {
            "inject_sec": round(inject_sec, 2),
            "merge_total_sec": round(merge_sec, 2),
            "merge_per_round_sec": round(merge_sec / ROUNDS, 2),
            "merge_bytes_written_mb": round(written / 1e6, 1),
            "final_read_sec": round(read_sec, 2),
            "final_rows": n,
        }
        store.destroy()

    assert out["cow"]["final_rows"] == out["lsm"]["final_rows"] == out["lsm_compact4"]["final_rows"]
    out["merge_speedup_lsm_vs_cow"] = round(
        out["cow"]["merge_per_round_sec"] / out["lsm"]["merge_per_round_sec"], 2
    )
    out["merge_speedup_lsm_vs_cow_nocount"] = round(
        out["cow_nocount"]["merge_per_round_sec"]
        / out["lsm_nocount"]["merge_per_round_sec"],
        2,
    )
    Path("BENCH_STORE.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
