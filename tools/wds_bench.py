"""Export-sink throughput + scaling evidence for `write_webdataset`.

The last funnel stage has to keep up with the rest of the pipeline:
this measures packing + tar assembly + sha256 + disk write over an
input_hint-shaped corpus (~2.4 GB of image payloads tiled from 300
deterministic uniques), at taskset-pinned local[8] vs local[32] on the
identical parquet input — the same N -> 4N evidence shape as
tools/scaling_bench.py (BASELINE.json north rule).

Caveat the numbers honestly: this is ONE box with ONE disk. The tar
member assembly + sha256 are per-byte CPU and scale with cores; the
final write(2) lands in a shared page cache / single block device, so
a saturated-disk leg understates what 4N separate writers with 4N
disks would do — a first run against /tmp measured exactly that
confound (within-leg spreads of 23-58 s at <0.05% steal from page-
cache writeback of the PREVIOUS leg's 2.7 GB). Timed tar output
therefore goes to tmpfs (/dev/shm) when present: on a real 4N-executor
cluster each executor brings its own disk, so the scalable term this
box can faithfully measure is the CPU half (pack + tar + sha256),
not one shared block device. Per-leg steal jiffies are recorded so a
noisy pair is self-describing (BENCH.md bench discipline).

Usage: python tools/wds_bench.py            (writes BENCH_WDS.json)
       python tools/wds_bench.py --single N --data DIR   (one leg)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ROWS = 24_000
N_UNIQUE = 300
TARGET_BYTES = 64 * 1024 * 1024  # ~38 shards over ~2.4 GB
CORES = (8, 32)
LEGS = 5  # median-of-5: this box's leg-to-leg spread (BENCH.md §1
# host-noise note) is the dominant error term once steal and the
# single disk are out of the loop; 3 legs left a 3x spread
# timed tar output on tmpfs when available: the single shared block
# device is the one resource a real 4N cluster does NOT share
_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _steal() -> tuple[int, int] | None:
    try:
        vals = list(map(int, open("/proc/stat").readline().split()[1:]))
        return sum(vals), vals[7]
    except Exception:
        return None


def build_corpus(path: str) -> None:
    from pyspark.sql import functions as F

    from webcollector_spark import fixtures
    from webcollector_spark.schema import CORPUS_SCHEMA
    from webcollector_spark.session import get_spark

    spark = get_spark("wds-bench-build", cores=32, shuffle_partitions=32)
    uniq = fixtures.make_corpus(N_UNIQUE, sizes=(128, 192, 256))
    reps = (N_ROWS + len(uniq) - 1) // len(uniq)
    (
        spark.createDataFrame(uniq, schema=CORPUS_SCHEMA)
        .crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .limit(N_ROWS)
        .select(
            F.concat("image_id", F.lit("_r"), F.col("rep")).alias("image_id"),
            "bytes",
            "w",
            "h",
            "fmt",
            "caption",
            "phash",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )
    spark.stop()


def run_single(cores: int, data: str) -> None:
    from pyspark.sql import functions as F

    from webcollector_spark.operators import shards
    from webcollector_spark.session import get_spark

    # shuffle dirs on tmpfs too (both legs equally): repartition(shard)
    # spills 2.7 GB of shuffle files per leg, and on this box's single
    # ~45 MB/s virtual disk the kernel's dirty-page writeback throttle
    # makes legs bimodal (measured 6 s vs 62 s at <0.1% steal). A real
    # executor brings its own local SSD for shuffle; tmpfs is this
    # box's stand-in so the legs measure the work, not one disk.
    extra = {}
    if _SCRATCH:
        extra["spark.local.dir"] = tempfile.mkdtemp(
            prefix="wds_shuffle_", dir=_SCRATCH
        )
    spark = get_spark(
        f"wds-bench-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf=extra,
    )
    corpus = spark.read.parquet(data)

    def export(df, out_dir):
        sized = df.withColumn("n_bytes", F.length("bytes").cast("long"))
        packed = shards.pack_shards(
            sized, key="image_id", size="n_bytes",
            target_bytes=TARGET_BYTES, n_buckets=64,
        )
        assigned = sized.join(packed.select("image_id", "shard"), "image_id")
        return shards.write_webdataset(assigned, out_dir).collect()

    # untimed warm-up over the FULL corpus: spins up every Python
    # worker, JITs the join/window, and pulls the 2.5 GB parquet into
    # the page cache — a limit(1500) warm-up left the first timed leg
    # paying the cold disk read (measured 81 s vs 10 s steady-state)
    warm_dir = tempfile.mkdtemp(prefix="wds_warm_", dir=_SCRATCH)
    export(corpus, warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    walls, steals, manifest = [], [], None
    for _ in range(LEGS):
        out_dir = tempfile.mkdtemp(prefix="wds_timed_", dir=_SCRATCH)
        s0 = _steal()
        t0 = time.monotonic()
        manifest = export(corpus, out_dir)
        wall = time.monotonic() - t0
        s1 = _steal()
        walls.append(wall)
        if s0 and s1 and s1[0] > s0[0]:
            steals.append(round(100.0 * (s1[1] - s0[1]) / (s1[0] - s0[0]), 2))
        shutil.rmtree(out_dir, ignore_errors=True)

    wall = sorted(walls)[len(walls) // 2]
    n_rows = sum(r["n_rows"] for r in manifest)
    n_bytes = sum(r["tar_bytes"] for r in manifest)
    print(
        json.dumps(
            {
                "cores": cores,
                "rows": n_rows,
                "shards": len(manifest),
                "tar_bytes": n_bytes,
                "wall_sec_legs": [round(w, 2) for w in walls],
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_rows / wall, 1),
                "mb_per_sec": round(n_bytes / wall / 1e6, 1),
                "steal_pct_legs": steals,
            }
        )
    )
    spark.stop()
    if _SCRATCH and "spark.local.dir" in extra:
        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)


def main() -> None:
    data = tempfile.mkdtemp(prefix="wds_corpus_")
    try:
        build_corpus(data)
        results = {}
        for cores in CORES:
            cmd = [sys.executable, __file__, "--single", str(cores), "--data", data]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
                env=dict(os.environ, SPARK_GRAFT_CPUS=str(cores)),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[cores] = json.loads(line)
        lo, hi = results[CORES[0]], results[CORES[1]]
        summary = {
            "metric": "webdataset export sink throughput (pack+tar+sha256+write)",
            "legs": results,
            "scaling_efficiency_8_32": round(
                (hi["mb_per_sec"] / lo["mb_per_sec"]) / (CORES[1] / CORES[0]), 3
            ),
        }
        Path("BENCH_WDS.json").write_text(json.dumps(summary, indent=2) + "\n")
        print(json.dumps(summary))
    finally:
        shutil.rmtree(data, ignore_errors=True)


if __name__ == "__main__":
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        cores = int(sys.argv[i + 1])
        data = sys.argv[sys.argv.index("--data") + 1]
        run_single(cores, data)
    else:
        main()
