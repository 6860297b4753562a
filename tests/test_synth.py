"""Fixture generator determinism + FIXTURES.md contract checks."""

import pyarrow.parquet as pq

from frontera_ray.sources import synth
from frontera_ray import schema as S


def test_pages_schema_and_determinism():
    t1 = synth.build_pages(synth.SMOKE)
    t2 = synth.build_pages(synth.SMOKE)
    assert t1.schema.equals(S.PAGES)
    assert t1.equals(t2)
    # 5 hosts × 20 pages + 5 robots + 3 dirty + 2 query-pair rows
    assert t1.num_rows == 5 * 20 + 5 + 3 + 2


def test_link_graph_shape():
    # binary tree children + cross-host + dead + dup back-link
    links = synth.outlinks(0, 0, 5, 20)
    assert links == ["/p1", "/p2", "http://site0.test/p0", "/dead0", "/p0"]
    links = synth.outlinks(2, 3, 5, 20)
    assert links == ["/p7", "/p8", "http://site0.test/p0", "/dead3", "/p0"]
    # leaf page: no children
    links = synth.outlinks(0, 19, 5, 20)
    assert links[0].startswith("http://")  # no same-host children


def test_robots_rules():
    assert "Disallow: /\n" in synth.robots_body(4)
    assert "Disallow: /p1" in synth.robots_body(3)
    assert "Disallow: /p1" in synth.robots_body(10)
    assert synth.robots_body(0) == "User-agent: *\nDisallow:\n"


def test_seeds():
    seeds = synth.build_seeds(synth.SMOKE)
    assert seeds["url"].to_pylist() == [
        "http://site0.test/p0",
        "http://site1.test/p0",
        "http://site2.test/p0",
        "http://site4.test/p0",
    ]
    assert seeds["score"].to_pylist() == [1.0, 0.9, 0.8, 0.6]


def test_write_fixture_idempotent(tmp_path):
    d = str(tmp_path / "fx")
    out1 = synth.write_fixture(d, synth.SMOKE)
    out2 = synth.write_fixture(d, synth.SMOKE)  # cached, no rewrite
    assert out1["parts"] == out2["parts"]
    total = sum(pq.read_table(p).num_rows for p in out1["parts"])
    assert total == synth.build_pages(synth.SMOKE).num_rows
    seeds = pq.read_table(out1["seeds_path"])
    assert seeds.num_rows == 4


def test_zipf_sizes():
    sizes = synth.BENCH.host_sizes()
    assert sizes.sum() >= 400_000
    # hot-host skew: host 0 holds a large share
    assert sizes[0] / sizes.sum() > 0.05
