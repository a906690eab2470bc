"""Pure-CPU scaling baseline: what does THIS BOX give an
embarrassingly-parallel workload at N vs 4N cores?

The north-rule criterion is Spark-job scaling efficiency >= 0.8 from N
to 4N. On a shared virtualized single box, the ceiling for ANY
workload — even one with zero shuffles, zero JVM, zero Python-worker
coordination — is set by the hardware/hypervisor (SMT siblings, shared
memory bandwidth, turbo budgets, neighbor tenants). This tool measures
that ceiling with the same kind of work the fetch hot loop does (zlib
inflate + numpy pixel math, the QIMG decode kernel) run in K
independent OS processes, each pinned to its own core, no IPC at all.

If Spark's fetch-schedule efficiency matches this baseline, the engine
adds no scaling loss of its own; the gap to 1.0 is the box. Report both
side by side in BENCH.md §1.

Usage: python tools/cpu_baseline_bench.py            # 2,8,32 legs
       CPU_BASELINE_CORES=2,8 python tools/cpu_baseline_bench.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORES = tuple(
    int(c) for c in os.environ.get("CPU_BASELINE_CORES", "2,8,32").split(",")
)
# per-process decode count, sized so each leg runs a few seconds
N_DECODES = int(os.environ.get("CPU_BASELINE_DECODES", "4000"))
# pin workers starting at this core id (lets a smoke run coexist with a
# bench pinned to low cores); final numbers use offset 0 on an idle box
OFFSET = int(os.environ.get("CPU_BASELINE_OFFSET", "0"))


def _worker(core: int, payloads: list[bytes], out: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    from webcollector_spark import codecs

    # warm (first decode pays numpy/zlib import + allocator setup)
    codecs.phash64(codecs.decode(payloads[0]))
    t0 = time.monotonic()
    acc = 0
    for i in range(N_DECODES):
        px = codecs.decode(payloads[i % len(payloads)])
        acc ^= codecs.phash64(px)  # keep the result live
    out.put((core, time.monotonic() - t0, acc))


def run_leg(n_cores: int, payloads: list[bytes]) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(OFFSET + c, payloads, q))
        for c in range(n_cores)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    total = n_cores * N_DECODES
    return {
        "cores": n_cores,
        "decodes": total,
        "wall_sec": round(wall, 3),
        "decodes_per_sec": round(total / wall, 1),
        "per_proc_sec": [round(r[1], 3) for r in sorted(results)],
    }


def main() -> None:
    from webcollector_spark import codecs, fixtures

    # same payload mix as the scaling bench corpus (128-256 px QIMG/PNG)
    corpus = fixtures.make_corpus(64, sizes=(128, 192, 256))
    payloads = [bytes(b) for b in corpus["bytes"]]

    legs = {c: run_leg(c, payloads) for c in CORES}
    out = {"metric": "pure-CPU decode scaling baseline (no Spark, no IPC)",
           "legs": legs}
    for a, b in zip(CORES, CORES[1:]):
        ratio = b / a
        eff = (
            legs[b]["decodes_per_sec"] / legs[a]["decodes_per_sec"]
        ) / ratio
        out[f"efficiency_{a}_to_{b}"] = round(eff, 3)
    Path("BENCH_CPU_BASELINE.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
