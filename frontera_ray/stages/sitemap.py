"""Sitemap parsing (SURVEY.md §2.2 M9 — reference:
frontera/strategy/discovery/sitemap.py:~1-100, approximate cite).

A map_batches stage over pages rows whose path is /sitemap.xml (or a
sitemap-index): extracts <loc> URLs with a namespace-insensitive regex
(full XML parsing is overkill for the <urlset>/<sitemapindex> shapes —
stdlib ElementTree remains a drop-in swap if exotic documents appear).
Output is LINKS-shaped so the rows feed the ordinary admission pipeline
(gate → offer/resolve) at depth 1 from a virtual root.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_LOC_RE = re.compile(rb"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.I)


def parse_sitemap(body: bytes) -> list[str]:
    """<loc> entries of a urlset or sitemapindex document."""
    if not body:
        return []
    return [m.decode("utf8", "ignore") for m in _LOC_RE.findall(body)]


class ExtractSitemapLinks:
    """map_batches callable over pages rows (url, html) restricted to
    sitemap documents; emits LINKS-schema rows (discovered_epoch = epoch,
    depth = 1, parent = 0 / score 1.0 — sitemap-discovered URLs enter the
    frontier like seed-adjacent links)."""

    def __init__(self, epoch: int):
        self.epoch = epoch

    @staticmethod
    def is_sitemap_url(u: str) -> bool:
        """Any *.xml whose filename mentions 'sitemap' (sitemap.xml,
        sitemap1.xml, sitemap-news.xml…) — so <sitemapindex> children are
        themselves followed when fetched (recursive index support)."""
        if not u.endswith(".xml"):
            return False
        return "sitemap" in u.rsplit("/", 1)[-1]

    def __call__(self, t: pa.Table) -> pa.Table:
        urls, out = t["url"].to_pylist(), []
        for u, body in zip(urls, t["html"].to_pylist()):
            if not self.is_sitemap_url(u):
                continue
            out.extend(parse_sitemap(body))
        n = len(out)
        return pa.table(
            {
                "url": pa.array(out, pa.string()),
                "parent_fp64": pa.array(np.zeros(n, dtype=np.uint64)),
                "parent_score": pa.array(np.ones(n, dtype=np.float64)),
                "parent_outdeg": pa.array(np.full(n, max(n, 1), dtype=np.int32)),
                "depth": pa.array(np.ones(n, dtype=np.int32)),
                "discovered_epoch": pa.array(np.full(n, self.epoch, dtype=np.int32)),
            }
        )
