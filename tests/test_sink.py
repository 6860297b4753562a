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
