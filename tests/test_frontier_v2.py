"""Round-2 frontier design tests (VERDICT #5 / #7):
- schedule_files (per-partition tasks, no shuffle) ≡ schedule (Dataset
  groupby) on the same frontier, every policy;
- distributed seed init (offer/resolve Dataset path) ≡ driver path;
- a ≥10^5-row seed list admits without driver materialization;
- tombstone compaction preserves crawl results.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frontera_ray.config import CrawlConfig, POLICIES
from frontera_ray.sources import synth


def _frontier_table(n=3000, hosts=40, parts=4, seed=3):
    rng = np.random.default_rng(seed)
    from frontera_ray import schema as S
    from frontera_ray.functions.fingerprint import signed_crc32

    host_ids = rng.integers(0, hosts, n)
    urls = [f"http://h{h}.test/x{i}" for i, h in enumerate(host_ids)]
    host = [f"h{h}.test" for h in host_ids]
    hh = np.array([signed_crc32(h) for h in host], dtype=np.int64)
    fp = rng.integers(0, 2**63, n).astype(np.uint64)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "fp64": pa.array(fp, pa.uint64()),
            "fp_hex": pa.array([f"{x:016x}" for x in fp], pa.string()),
            "host": pa.array(host, pa.string()),
            "host_hash": pa.array(hh, pa.int64()),
            "partition": pa.array((hh % parts).astype(np.int32), pa.int32()),
            "state": pa.array(np.full(n, S.QUEUED, np.uint8)),
            "score": pa.array(rng.random(n), pa.float64()),
            "depth": pa.array(rng.integers(0, 6, n).astype(np.int32), pa.int32()),
            "discovered_epoch": pa.array(
                rng.integers(-1, 4, n).astype(np.int32), pa.int32()
            ),
            "fetched_epoch": pa.array(np.full(n, -1, np.int32)),
            "status_code": pa.array(np.full(n, -1, np.int16)),
            "parent_fp64": pa.array(np.zeros(n, np.uint64)),
        }
    ).cast(S.FRONTIER)


@pytest.mark.parametrize("policy", POLICIES)
def test_schedule_files_equals_dataset_schedule(ray_session, tmp_path, policy):
    import ray.data as rd

    from frontera_ray.stages.schedule import schedule, schedule_files

    t = _frontier_table()
    cfg = CrawlConfig(
        pages_paths=[], seeds_path="", checkpoint_dir=str(tmp_path),
        num_partitions=4, policy=policy, max_requests_per_host=3,
        max_next_requests=20,
    )
    # dataset path
    want = schedule(rd.from_arrow(t), cfg).reset_index(drop=True)
    # file path: split each partition's rows across two files + tombstones
    tomb = t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)[::17]
    parts = t["partition"].to_numpy(zero_copy_only=False)
    qmap = {}
    for p in np.unique(parts):
        sub = t.filter(pa.array(parts == p))
        f1 = str(tmp_path / f"q-{p}-a.parquet")
        f2 = str(tmp_path / f"q-{p}-b.parquet")
        pq.write_table(sub.slice(0, sub.num_rows // 2), f1)
        pq.write_table(sub.slice(sub.num_rows // 2), f2)
        qmap[int(p)] = [f1, f2]
    # apply the same tombstones to the dataset path for comparison
    keep = ~np.isin(t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64), tomb)
    want = schedule(rd.from_arrow(t.filter(pa.array(keep))), cfg).reset_index(drop=True)
    got = schedule_files(qmap, tomb, None, cfg).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def _crawl(fixture, ckdir, **kw):
    from frontera_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        pages_paths=fixture["parts"],
        seeds_path=fixture["seeds_path"],
        checkpoint_dir=ckdir,
        max_epochs=kw.pop("max_epochs", 10),
        **kw,
    )
    return run_crawl(cfg, resume=False)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fx") / "smoke")
    return synth.write_fixture(d, synth.SMOKE)


def test_distributed_seed_init_parity(ray_session, fixture_dir, tmp_path):
    """seed_driver_threshold=0 forces the Dataset offer path; crawl output
    must be identical to the driver path."""
    c1, s1 = _crawl(fixture_dir, str(tmp_path / "ck_drv"))
    c2, s2 = _crawl(
        fixture_dir, str(tmp_path / "ck_dst"), seed_driver_threshold=0
    )
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])
    assert s1 == s2


def test_large_seed_list_admits_without_driver(ray_session, tmp_path):
    """10^5 seeds stream through the Dataset offer path; every unique url
    is admitted exactly once, dup seeds keep the max score."""
    import ray

    from frontera_ray.stages.seen_filter import make_seen_pool
    from frontera_ray.stages.links import SeedOfferStage
    import ray.data as rd

    n = 100_000
    urls = [f"http://seed{i % 50_000}.test/p0" for i in range(n)]  # 2x dups
    scores = [1.0 - (i % 50_000) / 100_000 for i in range(n)]
    seeds_path = str(tmp_path / "seeds.parquet")
    pq.write_table(
        pa.table({"url": pa.array(urls), "score": pa.array(scores)}), seeds_path
    )
    P = 4
    cfg = CrawlConfig(
        pages_paths=[], seeds_path=seeds_path,
        checkpoint_dir=str(tmp_path / "ck"), num_partitions=P,
        obey_robots=False,
    )
    shards = make_seen_pool(P, 1 << 20)
    ray.get([s.begin_epoch.remote(-1, "bfs", P, "seeds") for s in shards])
    from frontera_ray.strategy import CrawlStrategy

    rd.read_parquet(seeds_path).map_batches(
        SeedOfferStage(cfg, None, shards, CrawlStrategy()),
        batch_format="pyarrow",
    ).count()
    paths = [str(tmp_path / f"new-{k}.parquet") for k in range(P)]
    res = ray.get(
        [s.resolve.remote(paths[k]) for k, s in enumerate(shards)]
    )
    total = sum(r["count"] for r in res)
    assert total == 50_000
    got = pa.concat_tables([pq.read_table(p) for p in paths if os.path.exists(p)])
    assert got.num_rows == 50_000
    # each shard file is partition-pure (the schedule_files contract)
    for k, p in enumerate(paths):
        if os.path.exists(p):
            parts = np.unique(pq.read_table(p)["partition"].to_numpy(zero_copy_only=False))
            assert list(parts) == [k]


def test_compaction_preserves_crawl(ray_session, fixture_dir, tmp_path):
    """Forcing compaction every epoch must not change the crawl."""
    c1, s1 = _crawl(fixture_dir, str(tmp_path / "ck_a"))
    c2, s2 = _crawl(
        fixture_dir, str(tmp_path / "ck_b"), frontier_compact_min=1
    )
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])


def test_pages_cache_parity(ray_session, fixture_dir, tmp_path):
    """cache_pages_in_memory serves fetch + robots from materialized
    blocks; results must be identical to the parquet-scan path."""
    c1, s1 = _crawl(fixture_dir, str(tmp_path / "ck_nc"))
    c2, s2 = _crawl(
        fixture_dir, str(tmp_path / "ck_ca"), cache_pages_in_memory=True
    )
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])
    assert s1 == s2


def test_single_pass_canonical_parity(ray_session, tmp_path_factory, tmp_path):
    """assume_canonical_pages fuses fetch into the extract chain (ONE
    execution per epoch); on a canonical fixture (no dirty variants) the
    crawl must be identical to the two-pass path."""
    from dataclasses import replace

    d = str(tmp_path_factory.mktemp("fxc") / "clean")
    spec = replace(synth.SMOKE, dirty_variants=False)
    fx = synth.write_fixture(d, spec)
    c1, s1 = _crawl(fx, str(tmp_path / "ck_two"))
    c2, s2 = _crawl(fx, str(tmp_path / "ck_one"), assume_canonical_pages=True)
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])
    co1 = a1["counters"].to_pandas().sort_values(["epoch", "partition", "metric"]).reset_index(drop=True)
    co2 = a2["counters"].to_pandas().sort_values(["epoch", "partition", "metric"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(co1, co2)
    assert s1 == s2


def test_seen_disk_spill_crawl_parity(ray_session, fixture_dir, tmp_path):
    """Forcing the seen store to spill to disk mid-crawl must not change
    any artifact (exactness of the memmapped-run probes under the crawl)."""
    c1, s1 = _crawl(fixture_dir, str(tmp_path / "ck_mem"))
    c2, s2 = _crawl(
        fixture_dir,
        str(tmp_path / "ck_spill"),
        seen_spill_threshold=16,
        seen_spill_dir=str(tmp_path / "spill"),
        seen_max_resident_keys=8,
    )
    import os

    assert any(
        f.endswith(".npy") for f in os.listdir(tmp_path / "spill")
    ), "no disk spill happened"
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])
    assert s1 == s2


def test_resume_across_compaction(ray_session, fixture_dir, tmp_path):
    """Stopping after compacted epochs and resuming must reproduce the
    uninterrupted crawl exactly (manifest file-map + tombstone reset)."""
    from frontera_ray.pipelines.crawl import run_crawl

    full_ck = str(tmp_path / "ck_full")
    c_full, s_full = _crawl(
        fixture_dir, full_ck, max_epochs=12, frontier_compact_min=1
    )
    part_ck = str(tmp_path / "ck_part")
    _crawl(fixture_dir, part_ck, max_epochs=3, frontier_compact_min=1)
    cfg = CrawlConfig(
        pages_paths=fixture_dir["parts"],
        seeds_path=fixture_dir["seeds_path"],
        checkpoint_dir=part_ck,
        max_epochs=12,
        frontier_compact_min=1,
    )
    c_res, s_res = run_crawl(cfg, resume=True)
    o1 = c_full.artifacts()["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = c_res.artifacts()["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(c_full.artifacts()["seen"], c_res.artifacts()["seen"])


def test_distributed_seeds_with_politeness_actors(ray_session, fixture_dir, tmp_path):
    """Combination path: Dataset seed admission routing robots checks
    through the sharded politeness actor pool must equal the broadcast
    driver path (robots-gated seeds identical)."""
    c1, s1 = _crawl(fixture_dir, str(tmp_path / "ck_base"))
    c2, s2 = _crawl(
        fixture_dir,
        str(tmp_path / "ck_combo"),
        seed_driver_threshold=0,
        politeness_actors=True,
    )
    a1, a2 = c1.artifacts(), c2.artifacts()
    o1 = a1["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    o2 = a2["crawl_order"].to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert np.array_equal(a1["seen"], a2["seen"])
    assert s1 == s2


def test_schedule_files_tombstone_map_equals_array(ray_session, tmp_path):
    """Round-4 (VERDICT r3 #6): per-partition tombstone FILES must
    produce the identical schedule as the in-memory fp-array form (the
    array applies globally; the map routes each partition its own file)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from frontera_ray.stages.schedule import schedule_files

    t = _frontier_table()
    cfg = CrawlConfig(
        pages_paths=[], seeds_path="", checkpoint_dir=str(tmp_path),
        num_partitions=4, policy="bfs", max_requests_per_host=3,
        max_next_requests=20,
    )
    parts = t["partition"].to_numpy(zero_copy_only=False)
    fps = t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tomb = fps[::17]
    qmap, tmap = {}, {}
    for p in np.unique(parts):
        sub = t.filter(pa.array(parts == p))
        f1 = str(tmp_path / f"q-{p}.parquet")
        pq.write_table(sub, f1)
        qmap[int(p)] = [f1]
        # this partition's slice of the tombstone set, as a file
        pfps = sub["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mine = pfps[np.isin(pfps, tomb)]
        tf = str(tmp_path / f"t-{p}.parquet")
        pq.write_table(pa.table({"fp64": pa.array(mine, pa.uint64())}), tf)
        tmap[int(p)] = [tf]
    via_array = schedule_files(qmap, tomb, None, cfg).reset_index(drop=True)
    via_map = schedule_files(qmap, tmap, None, cfg).reset_index(drop=True)
    pd.testing.assert_frame_equal(via_map, via_array)
