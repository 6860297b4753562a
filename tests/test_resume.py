"""Resume-from-checkpoint: killed after epoch k, resumed ⇒ all artifacts
byte-equal to an uninterrupted run (FIXTURES.md §5 `resume`; north rule
"resumes exactly from checkpoint")."""

import os
import shutil

import numpy as np
import pytest

from frontera_ray.sources import synth
from frontera_ray.config import CrawlConfig


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fx") / "smoke")
    return synth.write_fixture(d, synth.SMOKE)


def _cfg(fixture, ckdir, max_epochs):
    return CrawlConfig(
        pages_paths=fixture["parts"],
        seeds_path=fixture["seeds_path"],
        checkpoint_dir=ckdir,
        policy="bfs",
        max_epochs=max_epochs,
    )


def _artifacts_tuple(crawler):
    a = crawler.artifacts()
    order = a["crawl_order"].to_pandas().sort_values("seq")
    out = a["out"].to_pandas().sort_values("url")
    return (
        list(zip(order["seq"], order["url"], order["epoch"], order["fetched"])),
        a["seen"].tolist(),
        list(zip(out["url"], out["text"])),
    )


def test_resume_equals_uninterrupted(ray_session, fixture_dir, tmp_path):
    from frontera_ray.pipelines.crawl import run_crawl, Crawler

    # uninterrupted reference run
    full_cfg = _cfg(fixture_dir, str(tmp_path / "ck_full"), 30)
    full_crawler, full_summary = run_crawl(full_cfg)
    full = _artifacts_tuple(full_crawler)

    # interrupted: stop after 3 epochs…
    part_dir = str(tmp_path / "ck_part")
    c1, s1 = run_crawl(_cfg(fixture_dir, part_dir, 3))
    assert s1["epochs"] == 3
    # …then resume in a FRESH crawler (new actor pool restored from blobs)
    c2, s2 = run_crawl(_cfg(fixture_dir, part_dir, 30), resume=True)
    assert s2["epochs"] == full_summary["epochs"] - 3
    assert _artifacts_tuple(c2) == full


def test_seen_checkpoint_cadence_resume_exact(ray_session, fixture_dir, tmp_path):
    """Round-3 (VERDICT r2 #7): with seen_checkpoint_every=3 the shard
    blobs are dumped only every third epoch; resuming at a blob-less epoch
    must replay the queued admission deltas and continue EXACTLY like an
    uninterrupted run (and like the cadence-1 run)."""
    import json
    from dataclasses import replace

    from frontera_ray.pipelines.crawl import run_crawl

    full_cfg = replace(
        _cfg(fixture_dir, str(tmp_path / "ck_full3"), 30), seen_checkpoint_every=3
    )
    full_crawler, full_summary = run_crawl(full_cfg)
    full = _artifacts_tuple(full_crawler)

    # cadence must not change the crawl at all vs the every-epoch dump
    ref_crawler, _ = run_crawl(_cfg(fixture_dir, str(tmp_path / "ck_ref1"), 30))
    assert full == _artifacts_tuple(ref_crawler)

    # stop after 4 epochs: epoch 3 (the resume point) has NO blob under
    # cadence 3 (dumps at 2, 5, …) — resume must replay epoch 3's deltas
    part = str(tmp_path / "ck_part3")
    c1, s1 = run_crawl(replace(_cfg(fixture_dir, part, 4), seen_checkpoint_every=3))
    assert s1["epochs"] == 4
    with open(os.path.join(part, "epoch-0003", "manifest.json")) as f:
        m = json.load(f)
    assert m["seen_epoch"] == 2, "expected epoch 3 to carry epoch-2 blobs"
    assert not os.listdir(os.path.join(part, "epoch-0003", "seen"))
    c2, s2 = run_crawl(
        replace(_cfg(fixture_dir, part, 30), seen_checkpoint_every=3), resume=True
    )
    assert s2["epochs"] == full_summary["epochs"] - 4
    assert _artifacts_tuple(c2) == full


def test_incomplete_epoch_is_replayed(ray_session, fixture_dir, tmp_path):
    """A crash mid-epoch leaves no manifest → that epoch is invisible and
    re-run idempotently on resume."""
    from frontera_ray.pipelines.crawl import run_crawl

    ckdir = str(tmp_path / "ck_crash")
    c1, _ = run_crawl(_cfg(fixture_dir, ckdir, 4))
    ref = None
    # simulate crash: epoch 3 completed but we delete its manifest (and seen
    # dumps stay — restore must come from epoch 2)
    os.remove(os.path.join(ckdir, "epoch-0003", "manifest.json"))
    c2, s2 = run_crawl(_cfg(fixture_dir, ckdir, 4), resume=True)
    c1_full, _ = run_crawl(_cfg(fixture_dir, str(tmp_path / "ck_ref"), 4))
    assert _artifacts_tuple(c2) == _artifacts_tuple(c1_full)


def test_frontier_state_holds_no_fp_arrays(ray_session, fixture_dir, tmp_path):
    """Round-4 (VERDICT r3 #6 done-criterion): the state threaded between
    epochs must contain only file paths and scalar counts — never a
    growing fingerprint array on the driver. Run a multi-epoch crawl and
    inspect the final state + every manifest."""
    import json

    from frontera_ray.pipelines.crawl import Crawler

    cfg = _cfg(fixture_dir, str(tmp_path / "cknp"), 5)
    crawler = Crawler(cfg)
    crawler.run(resume=False)
    latest = crawler.ck.latest_complete()
    assert latest is not None and latest >= 1
    st = crawler._frontier_state(latest)
    assert set(st) == {"map", "tmap", "tcount", "queued"}

    def only_paths_and_ints(obj):
        if isinstance(obj, dict):
            return all(only_paths_and_ints(v) for v in obj.values())
        if isinstance(obj, list):
            return all(isinstance(x, str) for x in obj)
        return isinstance(obj, int)

    assert only_paths_and_ints(st["map"])
    assert only_paths_and_ints(st["tmap"])
    assert only_paths_and_ints(st["tcount"])
    assert isinstance(st["queued"], int)
    assert not isinstance(st.get("tomb"), np.ndarray)  # old field gone
    # manifests carry the map + counts form, never an fp list
    for e in range(latest + 1):
        m = crawler.ck.load_manifest(e)
        assert "tombstones_file" not in m or m["tombstones_file"] is None
        assert only_paths_and_ints(m.get("tombstones_map", {}))
