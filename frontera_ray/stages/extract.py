"""Link extraction stage: html → one row per outlink edge.

The reference does this spider-side (Scrapy LinkExtractor; simulated by
frontera/utils/graphs/manager.py in tests — approximate cites, SURVEY.md §0).
Here it is a map_batches stage over the fetched pages: compiled-regex href
scan per document (html parsing is inherently per-doc; the regex is compiled
once per actor via the callable-class pattern), resolve relative hrefs
against the page url, emit a LINKS-shaped table (child url, parent lineage,
depth = parent depth + 1 — reference: depth middleware semantics,
SURVEY.md §2.2 M11).

Scale note: output is larger than input (avg outdegree ×); the stage
returns one Arrow table per batch and lets the streaming executor split
blocks — no driver materialization. html never leaves this stage.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import resolve_link

_HREF_RE = re.compile(rb'<a\s[^>]*href="([^"#]*)(?:#[^"]*)?"', re.I)
_BASE_RE = re.compile(r"^https?://[^/]+")


def _fast_resolve(base_root: str | None, base_url: str, href: str) -> str:
    """urljoin with the two dominant shapes special-cased (absolute hrefs
    and root-relative hrefs are ~all of real link graphs; both produce
    byte-identical results to urljoin — covered by the conformance parity
    tests, which resolve via stdlib urljoin in the oracle)."""
    if href.startswith(("http://", "https://")):
        return href  # urljoin returns absolute refs verbatim (no dot removal)
    if (
        base_root is not None
        and href.startswith("/")
        and not href.startswith("//")
        and "/." not in href  # dot segments ("/../x", "/a/./b") get urljoin's
        # remove_dot_segments treatment — fall back to the exact slow path
    ):
        return base_root + href
    return resolve_link(base_url, href)


class ExtractLinks:
    """map_batches callable over fetched pages.

    Input columns : url (canonical), fp64, score, depth, html
    Output columns: LINKS schema (url=child raw resolved url, parent_fp64,
                    parent_score, parent_outdeg, depth, discovered_epoch)
    """

    def __init__(self, epoch: int):
        self.epoch = epoch
        self.href_re = _HREF_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        fps = batch["fp64"].to_pylist()
        scores = batch["score"].to_pylist()
        depths = batch["depth"].to_pylist()
        htmls = batch["html"].to_pylist()

        c_url: list[str] = []
        c_pfp: list[int] = []
        c_pscore: list[float] = []
        c_poutdeg: list[int] = []
        c_depth: list[int] = []
        findall = self.href_re.findall
        base_match = _BASE_RE.match
        for u, fp, sc, dp, html in zip(urls, fps, scores, depths, htmls):
            if not html:
                continue
            hrefs = findall(html)
            outdeg = len(hrefs)
            m = base_match(u)
            root = m.group(0) if m else None
            dp1 = dp + 1
            for h in hrefs:
                c_url.append(_fast_resolve(root, u, h.decode("utf8", "ignore")))
                c_pfp.append(fp)
                c_pscore.append(sc)
                c_poutdeg.append(outdeg)
                c_depth.append(dp1)
        n = len(c_url)
        return pa.table(
            {
                "url": pa.array(c_url, pa.string()),
                "parent_fp64": pa.array(c_pfp, pa.uint64()),
                "parent_score": pa.array(c_pscore, pa.float64()),
                "parent_outdeg": pa.array(c_poutdeg, pa.int32()),
                "depth": pa.array(c_depth, pa.int32()),
                "discovered_epoch": pa.array([self.epoch] * n, pa.int32()),
            }
        )


def count_links(html: bytes | None) -> int:
    """n_links for the OUT table (same regex as the extract stage)."""
    if not html:
        return 0
    return len(_HREF_RE.findall(html))


class ExtractAllLinks:
    """Anchor links + (optionally) sitemap <loc> links in one pass —
    keeps the fused write-out → extract → admit → offer chain a single
    execution regardless of cfg.follow_sitemaps."""

    def __init__(self, epoch: int, follow_sitemaps: bool = False):
        self.anchors = ExtractLinks(epoch)
        if follow_sitemaps:
            from .sitemap import ExtractSitemapLinks

            self.sitemaps = ExtractSitemapLinks(epoch)
        else:
            self.sitemaps = None

    def __call__(self, t: pa.Table) -> pa.Table:
        a = self.anchors(t)
        if self.sitemaps is None:
            return a
        b = self.sitemaps(t)
        return pa.concat_tables([a, b]) if b.num_rows else a
