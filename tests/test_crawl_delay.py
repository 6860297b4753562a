"""Crawl-delay politeness (round-2; reference discovery-strategy per-domain
budget analogue): a host declaring ``Crawl-delay: d`` is capped at
max(1, floor(epoch_seconds / d)) requests per epoch. Engine ↔ pure-Python
oracle parity over a fixture where one host rate-limits itself."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frontera_ray.config import CrawlConfig
from frontera_ray.pipelines.oracle import run_oracle
from frontera_ray.sources import synth
from frontera_ray.state.politeness import RobotsRules, crawl_delay_caps


def test_parse_crawl_delay():
    r = RobotsRules("User-agent: *\nDisallow:\nCrawl-delay: 30\n")
    assert r.crawl_delay == 30.0
    assert RobotsRules("User-agent: *\nDisallow: /x\n").crawl_delay is None
    assert RobotsRules("User-agent: other\nCrawl-delay: 9\n").crawl_delay is None
    assert RobotsRules("User-agent: *\nCrawl-delay: nope\n").crawl_delay is None
    caps = crawl_delay_caps({"a": "User-agent: *\nCrawl-delay: 30\n"}, 60.0)
    assert caps == {"a": 2}
    assert crawl_delay_caps({"a": "User-agent: *\nCrawl-delay: 600\n"}, 60.0) == {"a": 1}


@pytest.fixture(scope="module")
def delay_fixture(tmp_path_factory):
    """SMOKE fixture with site1's robots rewritten to Crawl-delay: 30."""
    d = str(tmp_path_factory.mktemp("fxd") / "smoke")
    fx = synth.write_fixture(d, synth.SMOKE)
    new_body = "User-agent: *\nDisallow:\nCrawl-delay: 30\n"
    target = synth.robots_url(1)
    for p in fx["parts"]:
        t = pq.read_table(p)
        urls = t["url"].to_pylist()
        if target not in urls:
            continue
        i = urls.index(target)
        text = t["text"].to_pylist()
        html = t["html"].to_pylist()
        text[i] = new_body
        html[i] = new_body.encode()
        t = (
            t.set_column(t.schema.get_field_index("text"), "text", pa.array(text, pa.string()))
            .set_column(t.schema.get_field_index("html"), "html", pa.array(html, pa.binary()))
        )
        pq.write_table(t, p)
    return fx


def test_crawl_delay_parity_and_cap(ray_session, delay_fixture, tmp_path):
    from frontera_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        pages_paths=delay_fixture["parts"],
        seeds_path=delay_fixture["seeds_path"],
        checkpoint_dir=str(tmp_path / "ck"),
        policy="bfs",
        max_epochs=12,
        max_requests_per_host=4,
        epoch_seconds=60.0,  # delay 30 → cap 2/epoch on site1
    )
    crawler, summary = run_crawl(cfg, resume=False)
    oracle = run_oracle(cfg)
    order = crawler.artifacts()["crawl_order"].to_pandas().sort_values("seq")
    ray_seq = list(zip(order["seq"], order["url"], order["epoch"], order["fetched"]))
    oracle_seq = [(s, u, e, f) for s, u, e, f in oracle["crawl_order"]]
    assert ray_seq == oracle_seq
    assert np.array_equal(crawler.artifacts()["seen"], oracle["seen"])
    # the rate-limited host never exceeds 2 scheduled urls per epoch …
    df = order[order["url"].str.contains("site1.test")]
    per_epoch = df.groupby("epoch").size()
    assert (per_epoch <= 2).all() and len(df) > 2
    # … while an unlimited host reaches the full per-host budget
    df0 = order[order["url"].str.contains("site0.test")]
    assert df0.groupby("epoch").size().max() > 2
