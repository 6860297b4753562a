#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Default mode: ray.init(num_cpus=$RAY_GRAFT_CPUS or 32), run
  1. the headline crawl pipeline on the synthetic 500k-page / 2000-host
     Common-Crawl-style fixture (BASELINE.json input_hint shape; cached
     under /tmp/frontera_bench), and
  2. the operator suite over $GRAFT_SF_DIR (default /root/testdata/sf0.1),
then print {"metric", "value", "unit", "queries", "sf", "num_cpus", ...}.

--scaling: run the SAME job in two fresh processes at num_cpus=8 and 32
(the sandbox substitute for N vs 4N Ray nodes; BASELINE.md §scaling) and
print both throughputs + efficiency = (T_8/T_32)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_DIR = "/tmp/frontera_bench"
CRAWL_EPOCHS = 2
CRAWL_REPEATS = 2  # best-of-N: the sandbox VM has heavy timing noise

# Compute-weighted crawl fixture (round-3, VERDICT r2 #5): ~50 links per
# page make the per-epoch cost LINK-PROCESSING-bound (regex matches →
# resolve → sha1/crc32 enrich → offer routing — cache-resident CPU work)
# instead of block-movement-bound, and 128 seeds/host make epochs HUGE
# (~100k pages each) so per-epoch fixed costs (Dataset execution spin-up,
# actor RPC rounds) amortize away. Byte-heavy pads were measured to hit
# this box's memory-bandwidth wall (~0.49 ceiling 8→32) — per-byte
# compute is what scales at the CPU ceiling (~0.7+). On a real N→4N
# cluster BOTH resources scale with node count.
HEAVY_SPEC = dict(
    num_hosts=1000,
    pages_per_host=0,
    total_pages=200_000,
    dirty_variants=False,
    num_partitions=32,
    seed_hosts=1000,
    seed_pages=128,
    fanout=3,
    html_pad=512,
    extra_links=48,
)
HEAVY_EPOCHS = 2

# XL fixture (round-5, VERDICT r4 #8): the 4M-page / 8000-host big-epoch
# configuration from the r3 probe, promoted to a standard --scaling-xl
# target. Epochs here schedule 300k-500k pages, 5-10× the std fixture, so
# per-epoch fixed costs (Dataset spin-up, actor RPC rounds) are fully
# amortized — the closest this box gets to the north rule's 10^7+-page
# epochs.
XL_SPEC = dict(
    num_hosts=8000,
    pages_per_host=0,
    total_pages=4_000_000,
    dirty_variants=False,
    num_partitions=32,
    seed_hosts=8000,
    seed_pages=64,
    fanout=3,
    html_pad=256,
)
XL_EPOCHS = 3

# operator suite benched over the sf dir (names = queries() keys)
BENCH_QUERIES = [
    "groupby_agg",
    "filter_topk",
    "hash_join_agg",
    "pricing_summary",
    "window_tumbling",
    "topk_per_key",
    "semi_join",
    "shuffle_join",
    "schedule_topk",
    "exact_dedup",
    "clean_corpus",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_dup_pairs",
    "pagerank_pairs",
    "token_stats",
    "quality_scores",
    "repetition_scores",
    "tfidf_top_terms",
    "top_ngrams",
    "vocab_prune",
    "bm25_topk",
    "contamination_check",
    "funnel_counts",
    "retention_cohorts",
    "asof_join",
    "sessionize",
    "props_extract_agg",
    "value_histogram",
    "star_join_revenue",
    "lang_id",
    "ann_bruteforce",
    "ann_lsh",
    "media_features",
    # round-4 additions: every remaining driver-window operator gets a
    # per-query record (totals are therefore not comparable to BENCH_r03's
    # 35-query suite — compare per-query, as BASELINE.md does)
    "quantiles",
    "rollup_counts",
    "anti_join",
    "distinct_pairs",
    "url_fingerprint",
    "doc_fingerprints",
    "minhash_cluster_reps",
    "cluster_reps_labelprop",
    "ngram_jaccard_pairs",
    "ann_ivf",
    "media_pipeline",
    "hash_sample",
    "stratified_sample",
    "bottomk_sample",
    "weighted_sample",
    "window_hopping",
    # round-5 additions (tail-slot operators; totals again not comparable
    # to earlier rounds — compare per-query)
    "shipping_priority",
    "local_supplier_volume",
    "filter_funnel",
    "trigram_lift",
    "revenue_forecast",
    "promo_revenue",
    "returned_item_revenue",
    "large_volume_orders",
    "late_shipment_priority",
    "weekday_activity",
    "hourly_load",
    "knn_graph",
    "rarity_scores",
    "nation_trade_volume",
    "nation_market_share",
    "customer_order_distribution",
    "top_supplier_revenue",
    "small_quantity_revenue",
]


def _quiet():
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res) -> int:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def crawl_bench(ncpus: int, heavy: bool = False, xl: bool = False) -> dict:
    from frontera_ray.sources import synth
    from frontera_ray.config import CrawlConfig
    from frontera_ray.pipelines.crawl import run_crawl

    if xl:
        fx = synth.write_fixture(
            os.path.join(BENCH_DIR, "pages_xl"),
            synth.FixtureSpec(**XL_SPEC),
        )
    elif heavy:
        fx = synth.write_fixture(
            os.path.join(BENCH_DIR, "pages_heavy"),
            synth.FixtureSpec(**HEAVY_SPEC),
        )
    else:
        fx = synth.write_fixture(os.path.join(BENCH_DIR, "pages1m"), synth.BENCH)
    # warm the OS page cache so both parallelism levels measure compute+
    # shuffle, not first-touch disk reads
    for p in fx["parts"]:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    best = None
    epochs = XL_EPOCHS if xl else (HEAVY_EPOCHS if heavy else CRAWL_EPOCHS)
    repeats = 1 if xl else CRAWL_REPEATS  # an xl crawl is its own long run
    for rep in range(repeats):
        ck = os.path.join(BENCH_DIR, f"ck-{'x' if xl else ('h' if heavy else '')}{ncpus}")
        shutil.rmtree(ck, ignore_errors=True)
        # cluster-size-proportional layout, as on a real N vs 4N cluster:
        # partition/shard count scales with the cluster; per-partition
        # politeness budget stays fixed, so a bigger cluster schedules
        # proportionally bigger epochs
        cfg = CrawlConfig(
            pages_paths=fx["parts"],
            seeds_path=fx["seeds_path"],
            checkpoint_dir=ck,
            policy="opic",
            num_partitions=max(8, ncpus),
            max_requests_per_host=256,
            max_next_requests=16384,
            max_epochs=epochs,
            # round-3 blob cadence: dump seen blobs every 4 epochs instead
            # of every epoch (resume stays exact via delta replay — tested
            # with cadence > 1); measured ~0.3 s/epoch off the resolve round
            seen_checkpoint_every=4,
            seen_capacity=1 << 21,
            # the BENCH fixture stores canonical urls (dirty_variants=False)
            # → skip per-row canonicalization in the fetch filter
            assume_canonical_pages=True,
            # pages fit the object store → decode parquet once, serve all
            # epochs (and robots collection) from materialized blocks,
            # split past the zipf-hot partition files so no single block
            # straggles the fused fetch→extract chain
            cache_pages_in_memory=True,
            # 2 blocks/CPU: enough to split the zipf-hot partition file
            # (the politeness caps already balance EXTRACT work per block;
            # only the cheap url-scan is skewed), while keeping post-filter
            # blocks big enough that per-task overhead stays amortized —
            # 8 blocks/CPU measured slower (74-page batches, task overhead)
            pages_read_blocks=ncpus * 2,
        )
        t0 = time.perf_counter()
        crawler, summary = run_crawl(cfg, resume=False)
        dt = time.perf_counter() - t0
        summary = dict(summary, epoch_sec=crawler.epoch_sec)
        if best is None or dt < best[0]:
            best = (dt, summary)
    dt, summary = best
    out = {
        "sec": round(dt, 2),
        "repeats": repeats,
        "epochs": summary["epochs"],
        "urls_scheduled": summary["scheduled"],
        "pages_fetched": summary["fetched"],
        "urls_scheduled_per_s": round(summary["scheduled"] / dt, 1),
        "pages_fetched_per_s": round(summary["fetched"] / dt, 1),
    }
    # steady-state throughput = epoch loop only, excluding one-off session
    # setup (pages materialize, robots collection, actor spawn). On a real
    # N→4N cluster that setup is itself a parallel decode that scales with
    # nodes; on THIS one box it is memory-bandwidth-bound and can't — so
    # the steady-state number is the honest compute-scaling signal.
    esec = sum(summary.get("epoch_sec", []) or [0])
    if esec:
        out["epoch_sec_sum"] = round(esec, 2)
        out["steady_pages_per_s"] = round(summary["fetched"] / esec, 1)
    return out


def stage_bench(ncpus: int) -> dict:
    """Per-stage rows/s over the full 1M-page table (BASELINE.md table):
    isolates the compute kernels from epoch orchestration."""
    import ray.data as rd

    from frontera_ray.sources import synth
    from frontera_ray.stages.enrich import EnrichStage
    from frontera_ray.stages.extract import ExtractLinks

    fx = synth.write_fixture(os.path.join(BENCH_DIR, "pages1m"), synth.BENCH)
    n_rows = 0
    out = {}

    nblocks = ncpus * 8  # split skewed (zipf) part files into balanced tasks

    # canonicalize + sha1/fp64 + host + signed-crc32 partition (M1-M5)
    best = None
    for _ in range(CRAWL_REPEATS):
        ds = rd.read_parquet(fx["parts"], columns=["url"], override_num_blocks=nblocks)
        t0 = time.perf_counter()
        n_rows = ds.map_batches(EnrichStage(32), batch_format="pyarrow").count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["enrich_rows_per_s"] = round(n_rows / best)

    # html link extraction (M6) — regex + resolve + canonical child urls
    ds = rd.read_parquet(
        fx["parts"], columns=["url", "html"], override_num_blocks=nblocks
    )

    def prep(t):
        import pyarrow as pa
        import numpy as np

        n = t.num_rows
        return pa.table(
            {
                "url": t["url"],
                "html": t["html"],
                "fp64": pa.array(np.zeros(n, dtype=np.uint64)),
                "score": pa.array(np.ones(n, dtype=np.float64)),
                "depth": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    best = None
    for _ in range(CRAWL_REPEATS):
        t0 = time.perf_counter()
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            ExtractLinks(0), batch_format="pyarrow"
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["extract_pages_per_s"] = round(n_rows / best)
    return out


def run_bench() -> dict:
    import ray

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=ncpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # keep worker prints off stdout — the driver
        # parses our single JSON line
    )
    _quiet()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    crawl = crawl_bench(ncpus)
    crawl_heavy = (
        crawl_bench(ncpus, heavy=True)
        if os.environ.get("GRAFT_BENCH_HEAVY") == "1"
        else None
    )
    stages = stage_bench(ncpus)
    # cache-fair attribution (round-5, VERDICT r4 #7): the shared MinHash
    # signature build is paid ONCE here and reported as its own line, so
    # per-query times are cache-warm and stable across rounds (previously
    # whichever signature consumer ran first absorbed the ~2.7 s build)
    from frontera_ray.ops.dedup import cached_signatures, minhash_lsh_pairs

    t0 = time.perf_counter()
    cached_signatures(sf_dir)
    signature_build_sec = round(time.perf_counter() - t0, 2)
    # same treatment for the shared threshold-0.5 verified-pair table
    # (read by minhash_lsh_pairs, clean_corpus, minhash_cluster_reps, …):
    # pay it once here so no query absorbs another's build
    t0 = time.perf_counter()
    minhash_lsh_pairs(sf_dir)
    pairs_build_sec = round(time.perf_counter() - t0, 2)
    query_secs: dict[str, float] = {"crawl_1m": crawl["sec"]}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(qs[name](sf_dir))
        query_secs[name] = round(time.perf_counter() - t0, 2)
    total = round(sum(query_secs.values()) + signature_build_sec + pairs_build_sec, 2)
    result = {
        "metric": "e2e_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        "signature_build_sec": signature_build_sec,
        "pairs_build_sec": pairs_build_sec,
        "sf": sf_dir,
        "num_cpus": ncpus,
        "crawl": crawl,
        "stages": stages,
    }
    if crawl_heavy is not None:
        result["crawl_heavy"] = crawl_heavy
    ray.shutdown()
    return result


_HW_PROBE = """
import hashlib, multiprocessing as mp, time, json
def work(n):
    h = hashlib.sha1
    for i in range(n):
        h(str(i).encode()).digest()
def run(procs, per=1_000_000):
    with mp.Pool(procs) as p:
        t0 = time.perf_counter()
        p.map(work, [per] * procs)
        return procs * per / (time.perf_counter() - t0)
if __name__ == "__main__":
    r8 = max(run(8), run(8)); r32 = max(run(32), run(32))
    print(json.dumps(round(r32 / r8 / 4, 3)))
"""

# memory-BANDWIDTH twin of the CPU probe: each worker streams a 50 MB
# array. Table decode / block movement — most of a crawl epoch — is bound
# by this ceiling, not the compute one; on a real N→4N cluster both scale
# with node count, on one box neither does.
_MEMBW_PROBE = """
import numpy as np, multiprocessing as mp, time, json
def work(n):
    a = np.random.default_rng(1).integers(0, 255, 50_000_000, dtype=np.uint8)
    s = 0
    for i in range(n):
        s += int((a + 1).sum())
    return s
def run(procs, per=6):
    with mp.Pool(procs) as p:
        t0 = time.perf_counter()
        p.map(work, [per] * procs)
        return procs * per / (time.perf_counter() - t0)
if __name__ == "__main__":
    r8 = max(run(8), run(8)); r32 = max(run(32), run(32))
    print(json.dumps(round(r32 / r8 / 4, 3)))
"""


def _probe(src: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True, check=True
    ).stdout
    return float(json.loads(out.strip().splitlines()[-1]))


def hw_ceiling() -> float:
    """Pure-CPU scaling of THIS box, no Ray: 8 vs 32 multiprocessing
    workers hashing, in a clean subprocess (the bench process may have a
    spawn start-method where nested functions don't pickle). On shared
    hardware this is < 1.0 and is the upper bound any compute-bound
    8-vs-32 measurement can reach — report it alongside."""
    return _probe(_HW_PROBE)


def membw_ceiling() -> float:
    """Memory-bandwidth scaling ceiling of THIS box (see _MEMBW_PROBE)."""
    return _probe(_MEMBW_PROBE)


def run_scaling() -> dict:
    """Fresh process per parallelism level (8 vs 32 CPUs) on the same
    input — the sandbox substitute for N vs 4N nodes."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEAVY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t8, t32 = results[8]["value"], results[32]["value"]
    f8 = results[8]["crawl"]["pages_fetched_per_s"]
    f32 = results[32]["crawl"]["pages_fetched_per_s"]
    s8 = results[8]["crawl"]["urls_scheduled_per_s"]
    s32 = results[32]["crawl"]["urls_scheduled_per_s"]
    hw = hw_ceiling()
    membw = membw_ceiling()
    crawl_eff = round((f32 / max(f8, 1e-9)) / 4, 3)
    hf8 = results[8]["crawl_heavy"]["pages_fetched_per_s"]
    hf32 = results[32]["crawl_heavy"]["pages_fetched_per_s"]
    heavy_eff = round((hf32 / max(hf8, 1e-9)) / 4, 3)
    hs8 = results[8]["crawl_heavy"].get("steady_pages_per_s", hf8)
    hs32 = results[32]["crawl_heavy"].get("steady_pages_per_s", hf32)
    heavy_steady_eff = round((hs32 / max(hs8, 1e-9)) / 4, 3)
    return {
        "metric": "scaling_8_to_32",
        "hw_ceiling_efficiency": hw,
        "membw_ceiling_efficiency": membw,
        # compute-weighted crawl (8 KB html/page → regex-bound epochs):
        # the configuration whose single-box ceiling is the CPU one
        "scaling_efficiency_crawl_heavy": heavy_eff,
        "scaling_efficiency_crawl_heavy_rel_hw": round(heavy_eff / max(hw, 1e-9), 3),
        "scaling_efficiency_crawl_heavy_steady": heavy_steady_eff,
        "scaling_efficiency_crawl_heavy_steady_rel_hw": round(
            heavy_steady_eff / max(hw, 1e-9), 3
        ),
        "crawl_heavy_fetched_per_s_8": hf8,
        "crawl_heavy_fetched_per_s_32": hf32,
        "crawl_heavy_steady_per_s_8": hs8,
        "crawl_heavy_steady_per_s_32": hs32,
        # raw numbers swing ±40% with host noise, but eff/ceiling is the
        # stable statistic on shared hardware; the crawl streams blocks, so
        # its binding single-box ceiling is the memory-bandwidth one
        "scaling_efficiency_crawl_rel_hw": round(crawl_eff / max(hw, 1e-9), 3),
        "scaling_efficiency_crawl_rel_membw": round(crawl_eff / max(membw, 1e-9), 3),
        "sec_8": t8,
        "sec_32": t32,
        "crawl_fetched_per_s_8": f8,
        "crawl_fetched_per_s_32": f32,
        "crawl_scheduled_per_s_8": s8,
        "crawl_scheduled_per_s_32": s32,
        "speedup_e2e": round(t8 / t32, 3),
        "scaling_efficiency_e2e": round((t8 / t32) / 4, 3),
        "scaling_efficiency_crawl": crawl_eff,
        "stage_efficiency": {
            k: round(
                results[32]["stages"][k] / max(results[8]["stages"][k], 1) / 4, 3
            )
            for k in results[32]["stages"]
        },
        "stages_8": results[8]["stages"],
        "stages_32": results[32]["stages"],
        "queries_8": results[8]["queries"],
        "queries_32": results[32]["queries"],
    }


def run_crawl_only() -> dict:
    """One process: standard + heavy crawl benches only (no query suite) —
    the unit the multi-window scaling protocol repeats."""
    import ray

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(
        address="local",
        num_cpus=ncpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    _quiet()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("GRAFT_BENCH_XL") == "1":
        out = {"num_cpus": ncpus, "crawl_xl": crawl_bench(ncpus, xl=True)}
    else:
        out = {
            "num_cpus": ncpus,
            "crawl": crawl_bench(ncpus),
            "crawl_heavy": crawl_bench(ncpus, heavy=True),
        }
    ray.shutdown()
    return out


def run_scaling_lite() -> dict:
    """One WINDOW of the multi-window scaling protocol (BASELINE.md): the
    crawl benches at 8 then 32 CPUs in fresh processes, plus both hardware
    ceilings probed in the SAME window. Windows are cheap (~5 min) so the
    median over several of them beats one expensive full run on this
    heavily-throttled box — never quote a single window."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--crawl-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw = hw_ceiling()
    membw = membw_ceiling()

    def eff(key, sub):
        v8 = results[8][sub].get(key, 0)
        v32 = results[32][sub].get(key, 0)
        return round(v32 / max(v8, 1e-9) / 4, 3)

    return {
        "metric": "scaling_window_8_to_32",
        "hw_ceiling_efficiency": hw,
        "membw_ceiling_efficiency": membw,
        "eff_crawl": eff("pages_fetched_per_s", "crawl"),
        "eff_crawl_steady": eff("steady_pages_per_s", "crawl"),
        "eff_heavy": eff("pages_fetched_per_s", "crawl_heavy"),
        "eff_heavy_steady": eff("steady_pages_per_s", "crawl_heavy"),
        "crawl_8": results[8]["crawl"],
        "crawl_32": results[32]["crawl"],
        "heavy_8": results[8]["crawl_heavy"],
        "heavy_32": results[32]["crawl_heavy"],
    }


def run_scaling_xl() -> dict:
    """One WINDOW of the scaling protocol at the XL fixture (round-5,
    VERDICT r4 #8): the 4M-page / 8000-host crawl at 8 then 32 CPUs in
    fresh processes, plus both hardware ceilings probed in the SAME
    window. Quote the median of ≥5 windows, never one."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_XL="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--crawl-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw = hw_ceiling()
    membw = membw_ceiling()

    def eff(key):
        v8 = results[8]["crawl_xl"].get(key, 0)
        v32 = results[32]["crawl_xl"].get(key, 0)
        return round(v32 / max(v8, 1e-9) / 4, 3)

    return {
        "metric": "scaling_xl_window_8_to_32",
        "hw_ceiling_efficiency": hw,
        "membw_ceiling_efficiency": membw,
        "eff_xl": eff("pages_fetched_per_s"),
        "eff_xl_steady": eff("steady_pages_per_s"),
        "xl_8": results[8]["crawl_xl"],
        "xl_32": results[32]["crawl_xl"],
    }


if __name__ == "__main__":
    if "--crawl-only" in sys.argv:
        print(json.dumps(run_crawl_only()))
    elif "--scaling-xl" in sys.argv:
        print(json.dumps(run_scaling_xl()))
    elif "--scaling-lite" in sys.argv:
        print(json.dumps(run_scaling_lite()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
