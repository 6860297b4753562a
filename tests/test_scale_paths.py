"""Scale-path equivalence: salted scheduling and the politeness actor pool
must produce IDENTICAL crawls to the default placements (SURVEY.md hard
part 4 / §2.3 T4)."""

import pytest

from frontera_ray.sources import synth
from frontera_ray.config import CrawlConfig


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fx") / "smoke")
    return synth.write_fixture(d, synth.SMOKE)


def _artifacts(crawler):
    a = crawler.artifacts()
    order = a["crawl_order"].to_pandas().sort_values("seq")
    return (
        list(zip(order["url"], order["epoch"], order["fetched"])),
        a["seen"].tolist(),
    )


def _run(fixture, ckdir, **kw):
    from frontera_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        pages_paths=fixture["parts"],
        seeds_path=fixture["seeds_path"],
        checkpoint_dir=ckdir,
        policy="bfs",
        max_epochs=6,
        **kw,
    )
    crawler, _ = run_crawl(cfg, resume=False)
    return _artifacts(crawler)


def test_salted_schedule_identical(ray_session, fixture_dir, tmp_path):
    base = _run(fixture_dir, str(tmp_path / "a"))
    salted = _run(fixture_dir, str(tmp_path / "b"), schedule_salt=3)
    assert salted == base


def test_politeness_actor_pool_identical(ray_session, fixture_dir, tmp_path):
    base = _run(fixture_dir, str(tmp_path / "c"))
    actors = _run(fixture_dir, str(tmp_path / "d"), politeness_actors=True)
    assert actors == base


def test_hash_join_agg_shuffle_path_identical(ray_session):
    """Round-3 (VERDICT r2 #6): when the dimension side is too big to
    broadcast, hash_join_agg routes through the generic co-partitioned
    hash_shuffle_join — the result must be identical to the broadcast
    path."""
    from frontera_ray.ops import relational

    sf = "/root/testdata/sf0.001"
    base = (
        relational.hash_join_agg(sf)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    shuffled = (
        relational.hash_join_agg(sf, broadcast_limit=0)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(shuffled, base)


def test_hash_shuffle_join_rejects_column_collision(ray_session):
    import ray.data as rd

    from frontera_ray.ops.relational import hash_shuffle_join

    sf = "/root/testdata/sf0.001"
    a = rd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    b = rd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    with pytest.raises(ValueError, match="collision"):
        hash_shuffle_join(a, b, "o_orderkey", "o_orderkey")


def test_hash_shuffle_join_rejects_reserved_tag_columns(ray_session):
    """ADVICE r3: an input side carrying route/side/jkey would silently
    overwrite the internal tag columns and corrupt routing — reject it."""
    import pyarrow as pa
    import ray.data as rd

    from frontera_ray.ops.relational import hash_shuffle_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "route": pa.array([0, 1], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([1, 2], pa.int64()), "v": pa.array([5, 6], pa.int64())})
    )
    with pytest.raises(ValueError, match="reserved"):
        hash_shuffle_join(left, right, "k", "rk")
    with pytest.raises(ValueError, match="reserved"):
        hash_shuffle_join(right, left, "rk", "k")


def test_hash_shuffle_join_post_equals_join_then_aggregate(ray_session):
    """round-5 post= fold: a per-key aggregate run inside the join's
    route groups must equal the same aggregate over the plain join
    output — routing hashes the key, so each key's rows are complete
    within one group."""
    import pandas as pd
    import ray.data as rd

    from frontera_ray.ops.relational import hash_shuffle_join

    sf = "/root/testdata/sf0.001"
    line = rd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"])
    orders = rd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["l_orderkey", "o_custkey"], sort=False, as_index=False
        )["l_linenumber"].sum()

    plain = hash_shuffle_join(line, orders, "l_orderkey", "o_orderkey").to_pandas()
    want = (
        per_order(plain)
        .sort_values(["l_orderkey", "o_custkey"])
        .reset_index(drop=True)
    )
    folded = (
        hash_shuffle_join(line, orders, "l_orderkey", "o_orderkey", post=per_order)
        .to_pandas()
        .sort_values(["l_orderkey", "o_custkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        folded.astype("int64"), want.astype("int64"), check_dtype=False
    )
    # post output must be group-complete: one row per key, no residuals
    assert folded["l_orderkey"].is_unique


def test_ivf_sample_partial_is_capped(ray_session):
    """VERDICT r3 #2: the IVF quantizer sample must never put more than
    `cap` rows per block on the driver (the old rule read the full
    embeddings table driver-side). Drive the per-batch partial directly
    with a block far larger than the cap and check the envelope, then
    check the merged sample respects the global cap."""
    import numpy as np
    import pyarrow as pa

    from frontera_ray.ops.ann import _SampleBottomN, _collect_sample

    n, cap = 5000, 64
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [np.zeros(4, dtype=np.float64) + i for i in range(n)],
                pa.list_(pa.float64()),
            ),
        }
    )
    part = _SampleBottomN(cap)(t)
    assert part.num_rows == cap
    sample = _collect_sample("/root/testdata/sf0.01", cap)
    assert len(sample) == cap


def test_ivf_fit_is_integer_exact(ray_session):
    """ADVICE r3: the Lloyd fit must be order-independent. Shuffling the
    sample row order changes init (by design) but NOT the arithmetic:
    member sums are int64, so fitting on the same sample twice is
    bit-identical, and centroids are integer vectors at scale 1e4."""
    import numpy as np

    from frontera_ray.ops.ann import _collect_sample, _fit_centroids

    sample = _collect_sample("/root/testdata/sf0.01", 256)
    c1 = _fit_centroids(sample, 16)
    c2 = _fit_centroids(sample.copy(), 16)
    assert c1.dtype == np.int64
    assert (np.abs(c1) <= 10_000).all()
    assert (c1 == c2).all()


def test_pair_graph_consumers_auto_switch_identical(ray_session):
    """Round-5 (VERDICT r4 #1): above pairs_limit, the pair-graph
    consumers route through the Dataset-end-to-end component path —
    output must be identical to the driver path on all three ops."""
    from frontera_ray.ops import dedup

    sf = "/root/testdata/sf0.001"
    assert dedup.minhash_cluster_reps(sf).equals(
        dedup.minhash_cluster_reps(sf, pairs_limit=0)
    )
    assert dedup.cluster_size_histogram(sf).equals(
        dedup.cluster_size_histogram(sf, pairs_limit=0)
    )
    assert dedup.near_dup_cross_source(sf).equals(
        dedup.near_dup_cross_source(sf, pairs_limit=0)
    )


def test_collect_pairs_bounded_driver_envelope(ray_session):
    """The guarded collector must bail (None) when the deduped pair set
    exceeds pairs_limit, and must never accumulate more than
    pairs_limit + one stream batch of pair rows on the driver."""
    from frontera_ray.ops import dedup

    sf = "/root/testdata/sf0.001"
    full = dedup.minhash_lsh_pairs(sf)
    assert full.num_rows > 3  # precondition: corpus has > limit pairs
    dedup._PAIRS_CACHE.clear()
    limit = 3
    out = dedup._collect_pairs_bounded(sf, 0.5, limit)
    assert out is None
    # the guard compacts as soon as the accumulated rows cross the
    # limit, so the peak is bounded by limit + one stream batch (Ray's
    # default iter_batches batch is ≤ 4096 rows here) — never the full
    # pair stream
    assert 0 < dedup._LAST_COLLECT_PEAK <= limit + 4096
    dedup._PAIRS_CACHE.clear()
    ok = dedup._collect_pairs_bounded(sf, 0.5, 10_000_000)
    assert ok is not None and ok.equals(full)
