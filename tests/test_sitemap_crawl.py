"""Sitemap following integrated into the crawl (cfg.follow_sitemaps):
pages reachable ONLY through a sitemap get crawled."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frontera_ray.config import CrawlConfig
from frontera_ray.sources.synth import EPOCH_2026


def _write_fixture(tmp_path):
    """One host: a sitemap.xml seed listing p0/p1; p0 links nothing,
    p1 reachable only via the sitemap."""
    sm_body = (
        b"<urlset><url><loc>http://sm.test/p0</loc></url>"
        b"<url><loc>http://sm.test/p1</loc></url></urlset>"
    )
    rows = [
        ("http://sm.test/sitemap.xml", sm_body, "sitemap", "zz"),
        ("http://sm.test/p0", b"<html><body>page zero</body></html>", "doc p0", "en"),
        ("http://sm.test/p1", b"<html><body>page one</body></html>", "doc p1", "en"),
        ("http://sm.test/robots.txt", b"User-agent: *\nDisallow:\n", "robots", "zz"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([EPOCH_2026] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pages = str(tmp_path / "pages.parquet")
    pq.write_table(t, pages)
    seeds = str(tmp_path / "seeds.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(["http://sm.test/sitemap.xml"], pa.string()),
                "score": pa.array([1.0], pa.float64()),
            }
        ),
        seeds,
    )
    return pages, seeds


@pytest.mark.parametrize("follow,expect_p1", [(True, True), (False, False)])
def test_sitemap_following(ray_session, tmp_path, follow, expect_p1):
    from frontera_ray.pipelines.crawl import run_crawl

    pages, seeds = _write_fixture(tmp_path)
    cfg = CrawlConfig(
        pages_paths=[pages],
        seeds_path=seeds,
        checkpoint_dir=str(tmp_path / f"ck{follow}"),
        policy="bfs",
        max_epochs=4,
        follow_sitemaps=follow,
    )
    crawler, _ = run_crawl(cfg, resume=False)
    urls = set(crawler.ck.read_all_out().to_pandas()["url"])
    assert "http://sm.test/sitemap.xml" in urls  # the seed itself
    assert ("http://sm.test/p1" in urls) == expect_p1
    assert ("http://sm.test/p0" in urls) == expect_p1


def test_sitemap_index_recursion(ray_session, tmp_path):
    """A <sitemapindex> seed points at child sitemaps with non-canonical
    names (sitemap-news.xml); their <urlset> pages are reached through TWO
    sitemap hops."""
    from frontera_ray.pipelines.crawl import run_crawl

    idx = (
        b"<sitemapindex><sitemap><loc>http://sm.test/sitemap-news.xml</loc>"
        b"</sitemap></sitemapindex>"
    )
    child = b"<urlset><url><loc>http://sm.test/deep</loc></url></urlset>"
    rows = [
        ("http://sm.test/sitemap.xml", idx, "idx", "zz"),
        ("http://sm.test/sitemap-news.xml", child, "child", "zz"),
        ("http://sm.test/deep", b"<html><body>deep page</body></html>", "deep", "en"),
        ("http://sm.test/robots.txt", b"User-agent: *\nDisallow:\n", "r", "zz"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([EPOCH_2026] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pages = str(tmp_path / "pages.parquet")
    pq.write_table(t, pages)
    seeds = str(tmp_path / "seeds.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(["http://sm.test/sitemap.xml"], pa.string()),
                "score": pa.array([1.0], pa.float64()),
            }
        ),
        seeds,
    )
    cfg = CrawlConfig(
        pages_paths=[pages], seeds_path=seeds,
        checkpoint_dir=str(tmp_path / "ck_idx"), policy="bfs",
        max_epochs=6, follow_sitemaps=True,
    )
    crawler, summary = run_crawl(cfg, resume=False)
    out = crawler.ck.read_all_out().to_pandas()
    assert "http://sm.test/deep" in set(out["url"])
