"""Benchmark runner (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus a crawl-round throughput figure on the
synthetic web. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "urls_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "generate_topn",
    "perhost_topk",
    "merge_lastwins",
    "inject_antijoin",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "broadcast_dim_join",
    "rollup_revenue",
    "asof_join",
    "range_join",
    "exists_semijoin",
    "pivot_conditional_agg",
    "sessionize",
    "events_hourly",
    "token_count",
    "quality_score",
    "dedup_exact",
    "minhash_band",
    "lsh_candidate_pairs",
    "dedup_cluster_keepers",
    "simhash",
    "jaccard_pairs",
    "jaccard_lsh_verified",
    "minhash_jaccard_est",
    "simhash_neardup_banded",
    "winnow_fingerprint",
    "ann_cosine_topk",
    "cosine_blocked_neardup",
    "rh_lsh_ann_pairs",
    "json_extract_agg",
    "embedding_norm",
    "image_decode_verify",
    "phash_neardup_banded",
    "ngram_overlap",
    "sample_hash_stratified",
    "train_val_split",
    "url_canonicalize",
    "ivf_ann_topk",
    "pq_adc_topk",
    "ivfadc_ann_topk",
    "gopher_repetition",
    "embed_quantize_int8",
    "decontaminate_ngram",
    "char_entropy",
    "tfidf_top_terms",
    "pagerank",
    "hll_registers",
    "cm_registers",
    "text_normalize",
    # re-admitted in r3: the per-query warm pass (below) absorbs its
    # one-time ~4s whole-stage-codegen JIT for the regex+md5 chain, so
    # the recorded figure is the sustained cost.
    "caption_dedup",
    "caption_spam",
    "caption_conflict",
    "caption_quality",
    "caption_conflict_flags",
    "phash_neardup_blocked",
    "image_decode_verify_jpeg",
    "image_decode_verify_gif",
    "audio_features_adpcm",
    "semdedup_keepers",
    # round-4 image-triage + ensemble-dedup additions
    "image_meta_sniff",
    "image_compression_stats",
    "dhash_neardup_blocked",
    "image_neardup_keepers",
    "image_channel_stats",
    "imagetext_filter",
    "aspect_bucket_assign",
    # round-4 training-export tail: shard packing + mixture + blur gate
    "shard_assign",
    "shard_manifest",
    "source_mixture_weights",
    "mixture_interleave",
    "image_features_fused",
    "image_neardup_best_keepers",
    "image_sharpness",
]
# HEADLINE is an ordering prefix, not a filter: main() appends every
# registry entry not named above, so the driver's BENCH_r{N}.json always
# carries a per-query number for the FULL registry and a new operator
# can't silently drift out of the recorded suite.


def crawl_bench(
    spark, n_pages: int = 24000, depth: int = 3, n_seeds: int = 256
) -> dict:
    """BFS crawl SMOKE over the synthetic web — tracks regressions in
    the round loop itself (generate -> fetch -> merge -> repeat), NOT
    the throughput headline. At 24k pages the job finishes in 10-25 s,
    which is stage-latency-bound: r03's three samples spanned 3.3x
    (7.2/13.0/24.0 s) at 0.85% steal, so its URLs/sec is not a stable
    metric (VERDICT r3 finding 3). The headline `urls_per_sec` now
    comes from sustained_bench() below — the 300k-URL steady-state
    round, which is stable +/-4% across rounds."""
    from webcollector_spark import fixtures
    from webcollector_spark.config import CrawlerConfig
    from webcollector_spark.crawler import RamCrawler
    from webcollector_spark.sources.requester import SyntheticRequester

    corpus = fixtures.make_corpus(min(n_pages, 800))
    graph = fixtures.make_site_graph(n_pages, n_hosts=12, out_degree=8)
    # cap image payloads: reuse corpus images cyclically
    graph["image_id"] = [f"img{i % len(corpus):08d}" for i in range(n_pages)]
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = CrawlerConfig(
        per_host_top_k=50_000,
        bloom_capacity=200_000,
        fetch_partitions=cpus,
    )
    # warm-up (untimed): spin up Python workers + JIT the round's
    # codegen so the timed figure is sustained throughput, not
    # cold-start (the BASELINE metric says "sustained")
    warm = RamCrawler(spark, req, config=cfg)
    warm.add_seed(fixtures.seeds_for(graph, 64))
    warm.start(1)

    # median-of-3 timed crawls (same discipline as the per-query
    # timings): this 24k-page job finishes in 10-20 s, so its rounds
    # are fixed-overhead-dominated and a single sample swings ~2x with
    # host noise (measured 575-1174 URLs/s back-to-back). The SUSTAINED
    # throughput figure lives in tools/scaling_bench.py (300k-URL
    # rounds); this one tracks regressions in the round loop itself.
    samples = []
    for _ in range(3):
        crawler = RamCrawler(spark, req, config=cfg)
        crawler.add_seed(fixtures.seeds_for(graph, n_seeds))
        t0 = time.monotonic()
        metrics = crawler.start(depth)
        samples.append((time.monotonic() - t0, metrics))
    samples.sort(key=lambda s: s[0])
    wall, metrics = samples[len(samples) // 2]
    executed = sum(m.generated for m in metrics)
    return {
        "crawl_smoke_pages": n_pages,
        "crawl_smoke_rounds": len(metrics),
        "crawl_smoke_executed": executed,
        "crawl_smoke_wall_sec": round(wall, 3),
        "crawl_smoke_urls_per_sec": round(executed / wall, 2) if wall > 0 else 0.0,
        "crawl_smoke_samples_sec": [round(s[0], 3) for s in samples],
    }


def sustained_bench(cpus: str) -> dict:
    """The throughput HEADLINE: one steady-state 300k-URL crawl round
    (salted per-host generate -> vectorized fetch+decode+phash+links ->
    MERGE) via tools/scaling_bench.py --single, in its own
    taskset-pinned JVM so the core budget is honest. This is the
    BASELINE.json metric ('sustained fetch-schedule throughput'): at
    10^10-frontier scale a round covers millions of URLs and per-round
    fixed overhead vanishes; 300k is the smallest size where that
    asymptotic regime is visible (BENCH.md par.1), measured stable
    +/-4% across rounds vs the 3.3x spread of the 24k smoke."""
    import shutil
    import subprocess

    script = str(Path(__file__).resolve().parent / "tools" / "scaling_bench.py")
    cmd = [sys.executable, script, "--single", str(cpus)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{int(cpus) - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=dict(os.environ, SPARK_GRAFT_CPUS=str(cpus)),
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    return {
        "sustained_n_urls": r["n_urls"],
        "sustained_fetch_schedule_sec": r["fetch_schedule_sec"],
        "sustained_round_sec": r["round_sec"],
        # THE headline (BASELINE.json metric definition): generate+fetch
        "urls_per_sec": r["fetch_urls_per_sec"],
        # and the round including the MERGE commit
        "round_urls_per_sec": r["round_urls_per_sec"],
    }


def _cpu_stat() -> tuple[int, int] | None:
    """(total jiffies, steal jiffies) from /proc/stat — hypervisor
    steal bursts are the dominant noise source on this sandbox (BENCH.md
    §4); recording the level makes each bench run self-describing.
    None when unreadable: "unknown" must not be stamped as 0% steal."""
    try:
        vals = list(map(int, open("/proc/stat").readline().split()[1:]))
        return sum(vals), vals[7]
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    stat0 = _cpu_stat()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from webcollector_spark.plans import queries as qmod
    from webcollector_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=int(cpus))
    registry = qmod.queries()

    # Recording hygiene (BENCH.md §4, VERDICT r2 finding 4): one
    # hypervisor steal burst or JIT stall landing on a single timed run
    # can corrupt the round's canonical number by 10x (r02 recorded
    # url_canonicalize at 36.4s vs 0.37s warm). Per query: one UNTIMED
    # warm pass (absorbs codegen JIT + Python-worker spin-up + any
    # cached-subtree materialization), then median of REPS timed runs —
    # a burst must now hit 2 of 3 samples to move the median.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    times: dict[str, float] = {}
    suite = HEADLINE + sorted(n for n in registry if n not in HEADLINE)
    for name in suite:
        fn = registry[name]
        # Each query is timed SELF-CONTAINED: drop every persisted frame
        # left by earlier queries (e.g. the shared shingle cache) before
        # its warm pass. Cross-query cache residue both understates
        # queries that hit a predecessor's cache and inflates ones whose
        # shuffles spill because executor memory is half-occupied —
        # measured: gopher_repetition recorded 16.4s mid-suite vs 4.5s
        # in a fresh session before this isolation.
        spark.catalog.clearCache()
        n = len(fn(spark, sf_dir).collect())  # warm, untimed
        samples = []
        for _ in range(reps):
            df = fn(spark, sf_dir)
            t0 = time.monotonic()
            df.collect()
            samples.append(time.monotonic() - t0)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)
        print(
            f"# {name}: {times[name]}s median of "
            f"{[round(s, 3) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    crawl = crawl_bench(spark)
    print(f"# crawl smoke: {crawl}", file=sys.stderr)
    sustained = sustained_bench(cpus)
    print(f"# sustained: {sustained}", file=sys.stderr)

    stat1 = _cpu_stat()
    out = {
        "metric": "headline_suite_plus_crawl",
        # value = full-registry suite + 24k-crawl wall. The suite grows
        # with the registry each round (r03: 50, r04: 94), so compare
        # rounds on the per-query map / common entries, not the total;
        # the sustained run's wall is reported separately, not added.
        "value": round(sum(times.values()) + crawl["crawl_smoke_wall_sec"], 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        **crawl,
        **sustained,
        "cpus": int(cpus),
        # hypervisor steal during this run (% of all-core CPU time):
        # >~2-3% means the absolute timings above are burst-inflated;
        # null = the counter was unreadable (NOT a clean-run claim)
        "steal_pct_of_cpu": (
            round(100.0 * (stat1[1] - stat0[1]) / (stat1[0] - stat0[0]), 2)
            if stat0 and stat1 and stat1[0] > stat0[0]
            else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
