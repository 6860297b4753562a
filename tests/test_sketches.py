"""HLL sketch accuracy/merge properties + deterministic sampling."""

import numpy as np
import pytest

from frontera_ray.ops.sketches import HyperLogLog


def test_hll_accuracy():
    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 200_000):
        h = HyperLogLog(p=12)
        keys = rng.integers(0, 2**62, size=true_n, dtype=np.int64).astype(np.uint64)
        h.add_batch(keys)
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    ka = np.arange(0, 10_000, dtype=np.uint64)
    kb = np.arange(5_000, 15_000, dtype=np.uint64)
    a.add_batch(ka)
    b.add_batch(kb)
    u = HyperLogLog(12)
    u.add_batch(np.union1d(ka, kb))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)  # merge is exact on registers


def test_hll_roundtrip():
    h = HyperLogLog(10)
    h.add_batch(np.arange(1000, dtype=np.uint64))
    h2 = HyperLogLog.restore(h.dump())
    assert h2.estimate() == h.estimate()


def test_hll_distinct_users_close_to_exact(ray_session):
    import duckdb

    from frontera_ray.ops.sketches import hll_distinct_users

    sf = "/root/testdata/sf0.01"
    approx = hll_distinct_users(sf).to_pandas().set_index("event_type")
    exact = (
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) AS n "
            f"FROM read_parquet('{sf}/events.parquet') GROUP BY event_type"
        )
        .df()
        .set_index("event_type")
    )
    for et in exact.index:
        e, a = exact.loc[et, "n"], approx.loc[et, "approx_users"]
        assert abs(a - e) / max(e, 1) < 0.1, (et, e, a)


def test_quantile_sketch_rank_tolerance():
    """Det-KLL rank error: approx quantile must sit within +-2.5% rank of
    the exact discrete quantile, any partitioning."""
    import numpy as np

    from frontera_ray.ops.sketches import QuantileSketch

    rng = np.random.default_rng(7)
    data = rng.lognormal(0.0, 1.0, 50_000)
    s = QuantileSketch(256)
    for chunk in np.array_split(data, 37):  # uneven partitions
        s.add_batch(chunk)
    srt = np.sort(data)
    n = len(srt)
    for q in (0.5, 0.9, 0.99):
        approx = s.quantile(q)
        rank = np.searchsorted(srt, approx, side="right")
        assert abs(rank - q * n) <= 0.025 * n, (q, rank / n)


def test_quantile_sketch_merge_partition_independent():
    import numpy as np

    from frontera_ray.ops.sketches import QuantileSketch

    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, 20_000)
    a = QuantileSketch(128)
    a.add_batch(data)
    b = QuantileSketch(128)
    for chunk in np.array_split(data, 13):
        c = QuantileSketch(128)
        c.add_batch(chunk)
        b.merge(c)
    # deterministic compaction: same multiset in => same answers out
    # regardless of partitioning is NOT guaranteed exactly (promotion
    # order differs), but both must satisfy the same rank tolerance
    srt = np.sort(data)
    n = len(srt)
    for s in (a, b):
        for q in (0.5, 0.9):
            rank = np.searchsorted(srt, s.quantile(q), side="right")
            assert abs(rank - q * n) <= 0.03 * n
    # round-trip
    r = QuantileSketch.restore(b.dump())
    assert all(np.array_equal(x, y) for x, y in zip(r.levels, b.levels))


def test_quantile_sketch_query_close_to_exact(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    from frontera_ray.ops.sketches import quantile_sketch

    approx = quantile_sketch(sf).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.execute(
        "SELECT event_type, quantile_disc(value, 0.5) AS p50, "
        "quantile_disc(value, 0.9) AS p90 FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")
    for et in exact.index:
        for col, name in (("p50", "p50_e4"), ("p90", "p90_e4")):
            got = approx.loc[et, name] / 10_000
            want = exact.loc[et, col]
            assert abs(got - want) <= max(0.08 * abs(want), 0.5), (et, col, got, want)
