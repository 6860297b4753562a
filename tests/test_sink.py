"""Resumable partitioned-parquet sink: layout, counts, read-back
equality, retry idempotence, skip-on-manifest."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def _events_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/events.parquet")


def test_write_partitioned_layout_and_counts(ray_session, out_dir):
    from frontera_ray.sources.sink import write_partitioned

    man = write_partitioned(_events_ds(), out_dir, "event_type")
    src = pd.read_parquet(f"{SF_DIR}/events.parquet")
    by_type = src.groupby("event_type").size().to_dict()
    assert man["partitions"] == {k: int(v) for k, v in by_type.items()}
    assert man["rows"] == len(src)
    # dash-named partition dirs (no key=value => no hive inference),
    # manifest present
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS.json"))
    for k, v in by_type.items():
        files = glob.glob(os.path.join(out_dir, f"part-{k}", "*.parquet"))
        assert files
        got = pq.read_table(os.path.join(out_dir, f"part-{k}"))
        assert got.num_rows == v
        assert set(got["event_type"].to_pylist()) == {k}
    # read-back equality of one partition vs a direct filter
    k = sorted(by_type)[0]
    got = (
        pq.read_table(os.path.join(out_dir, f"part-{k}"))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        src[src["event_type"] == k].sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_rerun_is_idempotent_and_skips(ray_session, out_dir):
    from frontera_ray.sources.sink import write_partitioned

    man1 = write_partitioned(_events_ds(), out_dir, "event_type")
    files1 = sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet")))
    # manifest present -> skip (returns stored manifest, writes nothing)
    mtimes = {f: os.path.getmtime(f) for f in files1}
    man2 = write_partitioned(_events_ds(), out_dir, "event_type")
    assert man2 == man1
    assert {f: os.path.getmtime(f) for f in files1} == mtimes
    # crashed run (no manifest) -> rewrite lands on the SAME file set
    os.remove(os.path.join(out_dir, "_SUCCESS.json"))
    man3 = write_partitioned(_events_ds(), out_dir, "event_type")
    files3 = sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet")))
    assert man3 == man1
    assert files3 == files1


def test_weird_partition_values_are_sanitized(ray_session, out_dir):
    import pyarrow as pa
    import ray.data as rd

    from frontera_ray.sources.sink import write_partitioned

    t = pa.table(
        {
            "k": pa.array(["a/b", "c d", "x..", "plain"] * 3, pa.string()),
            "v": pa.array(list(range(12)), pa.int64()),
        }
    )
    man = write_partitioned(rd.from_arrow(t), out_dir, "k")
    assert man["rows"] == 12
    assert sorted(man["partitions"]) == ["a/b", "c d", "plain", "x.."]
    # every partition dir is a DIRECT child (no path traversal from '/')
    kids = sorted(os.listdir(out_dir))
    assert all(k.startswith("part-") or k == "_SUCCESS.json" for k in kids)
    assert len([k for k in kids if k.startswith("part-")]) == 4
    # read-back: each dir holds only its own partition's rows
    total = 0
    for k in kids:
        if not k.startswith("part-"):
            continue
        got = pq.read_table(os.path.join(out_dir, k))
        assert len(set(got["k"].to_pylist())) == 1
        total += got.num_rows
    assert total == 12


def test_escape_is_injective(ray_session, out_dir):
    """'a/b' escapes to 'a_2fb'; a LITERAL 'a_2fb' value must land in a
    DIFFERENT directory ('_' is escaped as '_5f'), else two partitions
    share one dir and the per-dir single-partition invariant breaks."""
    import pyarrow as pa
    import ray.data as rd

    from frontera_ray.sources.sink import write_partitioned

    t = pa.table(
        {
            "k": pa.array(["a/b", "a_2fb", "_", "plain"] * 2, pa.string()),
            "v": pa.array(list(range(8)), pa.int64()),
        }
    )
    man = write_partitioned(rd.from_arrow(t), out_dir, "k")
    assert man["rows"] == 8
    part_dirs = [k for k in os.listdir(out_dir) if k.startswith("part-")]
    assert len(part_dirs) == 4  # one dir per distinct value
    for k in part_dirs:
        got = pq.read_table(os.path.join(out_dir, k))
        assert len(set(got["k"].to_pylist())) == 1


def test_duplicate_identical_blocks_manifest_matches_disk(ray_session, out_dir):
    """Byte-identical input blocks collapse to one content-named file;
    the manifest must count the STORED rows, not the submitted rows."""
    import pyarrow as pa
    import ray.data as rd

    from frontera_ray.sources.sink import write_partitioned

    t = pa.table(
        {
            "k": pa.array(["x"] * 4, pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    # two single-block datasets with identical bytes, unioned: both blocks
    # write the same batch-<digest>.parquet
    ds = rd.from_arrow(t).union(rd.from_arrow(t))
    man = write_partitioned(ds, out_dir, "k")
    stored = pq.read_table(os.path.join(out_dir, "part-x")).num_rows
    assert stored == 4  # collapsed on disk
    assert man["rows"] == stored
    assert man["partitions"] == {"x": stored}
