"""SeenFilterStage (the groupby-free membership-filter alternative to the
offer/resolve protocol) — kept as a reusable stage; exercised with a real
actor pool."""

import numpy as np
import pyarrow as pa

from frontera_ray.stages.seen_filter import (
    SeenFilterStage,
    make_seen_pool,
    seed_seen,
    dump_shards,
    restore_shards,
)


def test_seen_filter_stage_roundtrip(ray_session):
    shards = make_seen_pool(2, capacity=1 << 12)
    t = pa.table(
        {
            "fp64": pa.array(np.arange(100, dtype=np.uint64)),
            "partition": pa.array((np.arange(100) % 4).astype(np.int32)),
        }
    )
    stage = SeenFilterStage(shards)
    first = stage(t)
    assert first.num_rows == 100
    second = stage(t)
    assert second.num_rows == 0
    # blobs round-trip through a fresh pool
    blobs = dump_shards(shards)
    shards2 = make_seen_pool(2, capacity=1 << 12)
    restore_shards(shards2, blobs)
    third = SeenFilterStage(shards2)(t)
    assert third.num_rows == 0
    # driver-side helper
    new = seed_seen(
        shards2,
        np.arange(100, 110, dtype=np.uint64),
        np.zeros(10, dtype=np.int64),
    )
    assert new.all()
