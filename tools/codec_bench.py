"""Codec-path throughput: what each JPEG wire format costs to decode,
and what the byte-capped progressive preview saves.

Single-process numpy timings (the decode kernels run inside Arrow UDF
workers at exactly this speed — there is no Spark overhead inside the
per-row kernel), over the engine's own corpora at the standard 32/64 px
test sizes. Writes BENCH_CODEC.json and prints a markdown table for
BENCH.md §4k.

The number that matters at 10^9 images: preview triage cost vs full
decode cost, and the byte fraction at which the preview's phash already
matches the final image (measured separately in
test_jpeg_progressive.py: hamming 0 at ~35% of bytes on photograph-like
content).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from webcollector_spark import codecs, fixtures  # noqa: E402
from webcollector_spark.jpeg_progressive import (  # noqa: E402
    decode_progressive_prefix,
)


def _time(fn, rows, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for r in rows:
            fn(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    corpora = {
        "baseline_444_q98": fixtures.make_corpus_jpeg(120),
        "subsampled_420_422_q92": fixtures.make_corpus_jpeg_subsampled(120),
        "progressive_q92": fixtures.make_corpus_jpeg_progressive(120),
        # the round-4 container additions: each a real bitstream through
        # the same magic-dispatch decode the curation operators use
        "gif87a_lzw": fixtures.make_corpus_gif(100),
        "bmp_24bpp": fixtures.make_corpus_bmp(100),
        "ico_dib_png": fixtures.make_corpus_ico(100),
        "tiff_packbits_mix": fixtures.make_corpus_tiff(100),
        "webp_vp8l": fixtures.make_corpus_webp(100),
    }
    out = {}
    for name, pdf in corpora.items():
        rows = [bytes(b) for b in pdf["bytes"]]
        n = len(rows)
        mb = sum(len(r) for r in rows) / 1e6
        sec = _time(codecs.decode, rows)
        out[name] = {
            "n": n,
            "payload_mb": round(mb, 3),
            "decode_sec": round(sec, 3),
            "images_per_sec": round(n / sec, 1),
        }
    # byte-capped preview over the progressive corpus. At these test
    # sizes 1 KiB covers most of the stream; the 384 B cut is the
    # DC-scan-only regime a byte-capped fetch actually lands in (and
    # the transfer saving — the real win at 10^9 images — is the
    # payload_mb column, not the decode CPU).
    prog = [bytes(b) for b in corpora["progressive_q92"]["bytes"]]
    for cap in (1024, 384):
        pref = [r[:cap] for r in prog]
        ok = 0
        for r in pref:
            try:
                _, scans, _ = decode_progressive_prefix(r)
                ok += scans >= 1
            except ValueError:
                pass
        sec = _time(lambda r: decode_progressive_prefix(r), pref)
        out[f"progressive_preview_{cap}b"] = {
            "n": len(pref),
            "payload_mb": round(sum(len(r) for r in pref) / 1e6, 3),
            "decode_sec": round(sec, 3),
            "images_per_sec": round(len(pref) / sec, 1),
            "preview_ok": ok,
        }
    Path("BENCH_CODEC.json").write_text(json.dumps(out, indent=2) + "\n")
    print("| path | images | payload MB | sec (best of 3) | images/s |")
    print("|---|---|---|---|---|")
    for k, v in out.items():
        extra = f" preview_ok={v['preview_ok']}" if "preview_ok" in v else ""
        print(
            f"| {k} | {v['n']} | {v['payload_mb']} | {v['decode_sec']} "
            f"| {v['images_per_sec']}{extra} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
