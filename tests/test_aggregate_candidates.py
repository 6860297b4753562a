"""aggregate_candidates — the Dataset-native groupby(fp64) admission
alternative to the offer/resolve shard protocol (stages/links.py §2):
winner = min (depth, parent_fp64, url), OPIC cash = Σ parent_score/outdeg.
Verified against a pandas reference on a synthetic edge set."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from frontera_ray.config import CrawlConfig
from frontera_ray.stages.links import aggregate_candidates


@pytest.mark.parametrize("policy", ["opic", "bfs"])
def test_aggregate_candidates_winners_and_scores(ray_session, tmp_path, policy):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 2000
    child = rng.integers(0, 300, n)  # duplicate children across parents
    urls = [f"http://h{c % 20}.test/c{c}" for c in child]
    depth = rng.integers(1, 5, n).astype(np.int32)
    parent = rng.integers(1, 1 << 40, n).astype(np.uint64)
    pscore = rng.random(n)
    outdeg = rng.integers(1, 9, n).astype(np.int32)
    links = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "parent_fp64": pa.array(parent, pa.uint64()),
            "parent_score": pa.array(pscore, pa.float64()),
            "parent_outdeg": pa.array(outdeg, pa.int32()),
            "depth": pa.array(depth, pa.int32()),
            "discovered_epoch": pa.array(np.full(n, 3, np.int32)),
        }
    )
    cfg = CrawlConfig(
        pages_paths=[], seeds_path="", checkpoint_dir=str(tmp_path),
        num_partitions=4, policy=policy, obey_robots=False,
    )
    from frontera_ray.stages.links import AdmitLinks

    admitted = (
        rd.from_arrow(links)
        .map_batches(AdmitLinks(cfg, None), batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(t["allowed"]).drop_columns(["allowed"]),
            batch_format="pyarrow",
        )
    )
    got = (
        aggregate_candidates(admitted, cfg)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # pandas reference
    df = links.to_pandas()
    df["cash"] = df["parent_score"] / np.maximum(df["parent_outdeg"], 1)
    ref = (
        df.sort_values(["url", "depth", "parent_fp64"])
        .groupby("url")
        .agg(depth=("depth", "min"), cash=("cash", "sum"))
        .reset_index()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # winner depth per child: min over (depth, parent, url) — url is the
    # group key so winner depth == min depth
    assert got["url"].tolist() == ref["url"].tolist()
    assert got["depth"].tolist() == ref["depth"].tolist()
    if policy == "opic":
        assert np.allclose(got["score"].to_numpy(), ref["cash"].to_numpy())
    else:
        assert np.allclose(got["score"].to_numpy(), 1.0 / (ref["depth"].to_numpy() + 1.0))
    assert (got["state"] == 1).all()  # QUEUED
