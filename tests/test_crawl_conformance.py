"""Conformance: the Ray pipeline must reproduce the pure-Python oracle's
(a) exact scheduled-URL sequence, (b) final seen set, (c) byte-identical
text per url — SURVEY.md §5 mirror of the reference's golden-sequence
backend tests (tests/backends.py, approx cite)."""

import shutil

import numpy as np
import pytest

from frontera_ray.sources import synth
from frontera_ray.config import CrawlConfig
from frontera_ray.pipelines.oracle import run_oracle


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fx") / "smoke")
    return synth.write_fixture(d, synth.SMOKE)


def _cfg(fixture, ckdir, policy, max_epochs=30):
    return CrawlConfig(
        pages_paths=fixture["parts"],
        seeds_path=fixture["seeds_path"],
        checkpoint_dir=ckdir,
        policy=policy,
        max_epochs=max_epochs,
    )


def _run_ray(cfg):
    from frontera_ray.pipelines.crawl import run_crawl

    crawler, summary = run_crawl(cfg)
    return crawler.artifacts(), summary


def _assert_parity(artifacts, oracle, pages_text):
    order = artifacts["crawl_order"].to_pandas().sort_values("seq")
    ray_seq = list(zip(order["seq"], order["url"], order["epoch"], order["fetched"]))
    oracle_seq = [(s, u, e, f) for s, u, e, f in oracle["crawl_order"]]
    assert ray_seq == oracle_seq, (
        f"crawl order diverges at "
        f"{next((i for i, (a, b) in enumerate(zip(ray_seq, oracle_seq)) if a != b), '?')}"
    )
    assert np.array_equal(artifacts["seen"], oracle["seen"])
    out = artifacts["out"].to_pandas()
    ray_texts = dict(zip(out["url"], out["text"]))
    assert ray_texts == oracle["out"]
    # byte-identity vs the INPUT pages table
    for url, text in ray_texts.items():
        assert text == pages_text[url], f"text mutated for {url}"


@pytest.fixture(scope="module")
def pages_text(fixture_dir):
    import pyarrow.parquet as pq
    from frontera_ray.functions.urlnorm import canonicalize

    m = {}
    for p in fixture_dir["parts"]:
        t = pq.read_table(p)
        for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            cu = canonicalize(url)
            if cu not in m or url < m[cu][1]:
                m[cu] = (text, url)
    return {u: t for u, (t, _) in m.items()}


@pytest.mark.parametrize(
    "policy,max_epochs",
    [("bfs", 30), ("dfs", 6), ("opic", 6), ("fifo", 5), ("lifo", 5), ("random", 5), ("basic", 5)],
)
def test_policy_parity(ray_session, fixture_dir, pages_text, tmp_path, policy, max_epochs):
    cfg = _cfg(fixture_dir, str(tmp_path / f"ck_{policy}"), policy, max_epochs)
    artifacts, summary = _run_ray(cfg)
    oracle = run_oracle(cfg)
    _assert_parity(artifacts, oracle, pages_text)
    assert summary["scheduled"] == len(oracle["crawl_order"])


def test_conformance_scale_parity(ray_session, tmp_path_factory, tmp_path):
    """FIXTURES.md conformance size (50 hosts × 40 pages ≈ 2k rows): exact
    parity on a partial BFS crawl at the bigger graph (robots rules hit
    s ∈ {3,10,17,…} and the cross-host lattice is denser)."""
    d = str(tmp_path_factory.mktemp("fxc") / "conf")
    fx = synth.write_fixture(d, synth.CONFORMANCE)
    cfg = _cfg(fx, str(tmp_path / "ck_conf"), "bfs", max_epochs=6)
    artifacts, summary = _run_ray(cfg)
    oracle = run_oracle(cfg)
    order = artifacts["crawl_order"].to_pandas().sort_values("seq")
    ray_seq = list(zip(order["seq"], order["url"], order["epoch"], order["fetched"]))
    oracle_seq = [(s, u, e, f) for s, u, e, f in oracle["crawl_order"]]
    assert ray_seq == oracle_seq
    import numpy as np

    assert np.array_equal(artifacts["seen"], oracle["seen"])
    assert summary["fetched"] > 30  # politeness budget bounds the 6-epoch ramp


def test_bfs_crawls_expected_set(ray_session, fixture_dir, tmp_path):
    """Sanity on the golden structure: site4 fully robots-blocked, site3
    reached only via cross-host links, p1-subtrees blocked on s%7==3."""
    cfg = _cfg(fixture_dir, str(tmp_path / "ck_chk"), "bfs", 30)
    oracle = run_oracle(cfg)
    urls = set(oracle["out"])
    assert not any("site4" in u for u in urls)
    assert any("site3" in u for u in urls)
    assert "http://site3.test/p1" not in urls  # robots: Disallow /p1 on s%7==3
    assert "http://site0.test/p1" in urls
