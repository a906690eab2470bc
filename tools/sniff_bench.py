"""Filter-before-decode evidence for the sniff triage stage: at 10^9
images the question is not whether `sniff_meta` is correct (the
registry row pins that) but how much of the decode bill it avoids and
how much the JVM-side prefix slice saves at the Arrow boundary.

Three variants over the SAME on-disk parquet corpus (real container
bytes — PNG/QIMG/JPEG/GIF — tiled from unique fixture images to N
rows, so every row carries a genuine payload and the scan cost is
identical across variants):

* sniff_prefix  — `sniff_meta` as shipped: `substring(bytes, 1, 4096)`
  in the JVM Project, so ~4 KB/row crosses into the pandas UDF;
* sniff_full    — the identical UDF with the slice disabled (prefix =
  16 MB), so the WHOLE payload crosses Arrow: isolates the transfer
  saving from the parsing saving;
* decode_dims   — full pixel decode to learn the same (fmt, w, h):
  what a pipeline without a header-sniff stage pays for triage.

Reported per variant: median-of-3 wall, rows/s, and MB shipped into
Python (exact: sum of sliced vs full octet_length). Steal jiffies are
recorded per leg (BENCH.md §4: hypervisor steal is the dominant noise
source on this box).

Usage: python tools/sniff_bench.py  (writes BENCH_SNIFF.json)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_UNIQUE = 600
N_ROWS = 60_000


def _steal() -> tuple[int, int] | None:
    try:
        vals = list(map(int, open("/proc/stat").readline().split()[1:]))
        return sum(vals), vals[7]
    except Exception:
        return None


def build_tiled_corpus(spark, path: str, n_rows: int) -> None:
    """Unique mixed-container images tiled Spark-side to n_rows and
    written once; all variants then scan the same files."""
    import pandas as pd

    from pyspark.sql import functions as F

    from webcollector_spark import fixtures
    from webcollector_spark.schema import CORPUS_SCHEMA

    uniq = pd.concat(
        [
            # larger edges than the test corpus so decode cost is
            # representative of real payloads
            fixtures.make_corpus(N_UNIQUE - 240, sizes=(128, 192, 256)),
            fixtures.make_corpus_jpeg(120, sizes=(96, 128)),
            fixtures.make_corpus_gif(120),
        ],
        ignore_index=True,
    )
    reps = (n_rows + len(uniq) - 1) // len(uniq)
    (
        spark.createDataFrame(uniq, schema=CORPUS_SCHEMA)
        .crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .limit(n_rows)
        .select(
            F.concat("image_id", F.lit("_r"), F.col("rep")).alias("image_id"),
            "bytes",
            "w",
            "h",
            "fmt",
            "caption",
            "phash",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from webcollector_spark import codecs
    from webcollector_spark.operators import sniff
    from webcollector_spark.session import get_spark

    spark = get_spark("sniff-bench", cores=32, shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="sniffbench")
    path = os.path.join(tmp, "corpus")
    build_tiled_corpus(spark, path, N_ROWS)
    corpus = spark.read.parquet(path)

    total_mb = corpus.agg(
        (F.sum(F.octet_length("bytes")) / 1e6).alias("mb")
    ).first()["mb"]
    prefix_mb = corpus.agg(
        (F.sum(F.least(F.octet_length("bytes"), F.lit(4096))) / 1e6).alias("mb")
    ).first()["mb"]

    def decode_dims(df):
        schema = T.StructType(
            [
                T.StructField("image_id", T.StringType()),
                T.StructField("fmt_sniffed", T.StringType()),
                T.StructField("w_sniffed", T.IntegerType()),
                T.StructField("h_sniffed", T.IntegerType()),
            ]
        )

        def run(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for r in pdf.to_dict("records"):
                    data = bytes(r["bytes"])
                    fmt, _, _ = codecs.sniff_header(data)
                    px = codecs.decode(data)
                    rows.append(
                        {
                            "image_id": r["image_id"],
                            "fmt_sniffed": fmt,
                            "w_sniffed": px.shape[1],
                            "h_sniffed": px.shape[0],
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id",
                        "fmt_sniffed",
                        "w_sniffed",
                        "h_sniffed",
                    ],
                )

        return df.select("image_id", "bytes").mapInPandas(run, schema=schema)

    variants = {
        "sniff_prefix": lambda: sniff.sniff_meta(corpus).count(),
        "sniff_full": lambda: sniff.sniff_meta(corpus, prefix=1 << 24).count(),
        "decode_dims": lambda: decode_dims(corpus).count(),
    }

    out: dict = {
        "n_rows": N_ROWS,
        "total_payload_mb": round(total_mb, 1),
        "prefix_shipped_mb": round(prefix_mb, 1),
        "variants": {},
    }
    for name, fn in variants.items():
        fn()  # untimed warm: python workers + codegen
        samples = []
        s0 = _steal()
        for _ in range(3):
            t0 = time.monotonic()
            n = fn()
            samples.append(time.monotonic() - t0)
        s1 = _steal()
        wall = sorted(samples)[1]
        leg = {
            "rows": n,
            "wall_sec": round(wall, 3),
            "samples_sec": [round(s, 3) for s in samples],
            "rows_per_sec": round(n / wall, 1),
        }
        if s0 and s1 and s1[0] > s0[0]:
            leg["steal_pct"] = round(100 * (s1[1] - s0[1]) / (s1[0] - s0[0]), 2)
        out["variants"][name] = leg
        print(f"# {name}: {leg}", file=sys.stderr)

    v = out["variants"]
    out["arrow_transfer_speedup"] = round(
        v["sniff_full"]["wall_sec"] / v["sniff_prefix"]["wall_sec"], 2
    )
    out["triage_vs_decode_speedup"] = round(
        v["decode_dims"]["wall_sec"] / v["sniff_prefix"]["wall_sec"], 2
    )
    Path("BENCH_SNIFF.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())
