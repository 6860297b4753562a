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
