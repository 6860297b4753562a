import numpy as np
import pyarrow as pa

from frontera_ray.stages.sitemap import ExtractSitemapLinks, parse_sitemap


SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://site0.test/p1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
     http://site0.test/p2
  </loc></url>
</urlset>"""

SITEMAP_INDEX = b"""<sitemapindex>
  <sitemap><loc>http://site0.test/sub/sitemap.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap():
    assert parse_sitemap(SITEMAP) == [
        "http://site0.test/p1",
        "http://site0.test/p2",
    ]
    assert parse_sitemap(SITEMAP_INDEX) == ["http://site0.test/sub/sitemap.xml"]
    assert parse_sitemap(b"") == []
    assert parse_sitemap(b"<html>not a sitemap</html>") == []


def test_extract_stage_links_shape():
    t = pa.table(
        {
            "url": ["http://site0.test/sitemap.xml", "http://site0.test/p0"],
            "html": [SITEMAP, b"<html><a href=\"/p1\">x</a></html>"],
        }
    )
    out = ExtractSitemapLinks(epoch=3)(t)
    assert out["url"].to_pylist() == [
        "http://site0.test/p1",
        "http://site0.test/p2",
    ]
    assert out["depth"].to_pylist() == [1, 1]
    assert out["discovered_epoch"].to_pylist() == [3, 3]
    # non-sitemap row contributed nothing
    assert out.num_rows == 2
