"""Fetch simulator: the scheduled batch "fetches" pages from the Parquet
pages table (replaces the reference's network side — Scrapy downloader via
frontera/contrib/scrapy/schedulers/frontier.py:~1-150; approximate cites,
SURVEY.md §0 — per BASELINE.json there is no network: fetching IS a lookup
into the Common-Crawl-style pages table).

Join strategy (SURVEY.md §2.4 J1): the scheduled batch is SMALL by
construction (≤ P × max_next_requests), so this is the canonical
**broadcast join**: ``ray.put`` the scheduled url→meta map once, scan ONLY
the pages partitions that contain scheduled hosts (the pages table is laid
out as one part file per signed_crc32(host) % n_parts — partition pruning at
the read), and filter inside map_batches. No shuffle; the scan parallelizes
over the pruned part files.

Duplicate canonical urls in the pages table (dirty URL variants) are
resolved deterministically: winner = lexicographically smallest raw url.

Output is a Dataset (html stays distributed — never collected to the
driver); the driver gets only the tiny fetched-fp64 list for state
transitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.urlnorm import canonicalize_array
from ..functions.fingerprint import crc32_batch


class _FetchFilter:
    """map_batches callable: canonicalize page urls, keep scheduled ones,
    attach scheduled meta from the broadcast map."""

    def __init__(self, sched_ref):
        self.sched_ref = sched_ref
        self._map = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._map is None:
            self._map = ray.get(self.sched_ref)  # once per actor
        smap = self._map
        raw = batch["url"]
        canon = canonicalize_array(raw)
        keep = np.fromiter(
            (u in smap for u in canon.to_pylist()), dtype=bool, count=len(canon)
        )
        if not keep.any():
            return _fetched_schema_table()
        sub = batch.filter(pa.array(keep))
        canon_sub = canon.filter(pa.array(keep))
        metas = [smap[u] for u in canon_sub.to_pylist()]
        fp = pa.array([m[0] for m in metas], pa.uint64())
        score = pa.array([m[1] for m in metas], pa.float64())
        depth = pa.array([m[2] for m in metas], pa.int32())
        part = pa.array([m[3] for m in metas], pa.int32())
        host = pa.array([m[4] for m in metas], pa.string())
        from .extract import count_links

        n_links = pa.array(
            [count_links(h) for h in sub["html"].to_pylist()], pa.int32()
        )
        return pa.table(
            {
                "url": canon_sub,
                "raw_url": sub["url"],
                "warc_ts": sub["warc_ts"],
                "html": sub["html"],
                "text": sub["text"],
                "lang": sub["lang"],
                "fp64": fp,
                "score": score,
                "depth": depth,
                "partition": part,
                "host": host,
                "n_links": n_links,
            }
        )


def _fetched_schema_table() -> pa.Table:
    return pa.schema(
        [
            ("url", pa.string()),
            ("raw_url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("fp64", pa.uint64()),
            ("score", pa.float64()),
            ("depth", pa.int32()),
            ("partition", pa.int32()),
            ("host", pa.string()),
            ("n_links", pa.int32()),
        ]
    ).empty_table()


def fetch_sim(
    scheduled: pd.DataFrame, pages_paths: list[str], assume_canonical: bool = False
):
    """scheduled (driver df with url/fp64/score/depth/partition/host) →
    fetched MATERIALIZED Dataset (see _FetchFilter output schema, minus
    raw_url). Bounded by the politeness budget, so materializing is safe.

    Dirty-variant collisions (two raw page rows canonicalizing to one url)
    are resolved without a shuffle: the (url, raw_url) projection is tiny
    (≤ budget rows), so the winner per url (min raw_url) is computed on the
    driver and applied as a broadcast filter."""
    n_parts = len(pages_paths)
    # prune: only pages parts whose host-partition appears in the batch
    hh = crc32_batch(scheduled["host"].tolist())
    needed = sorted(set(int(p) for p in (hh % n_parts)))
    paths = [pages_paths[p] for p in needed]
    smap = {
        r.url: (int(r.fp64), float(r.score), int(r.depth), int(r.partition), r.host)
        for r in scheduled.itertuples()
    }
    sched_ref = ray.put(smap)
    if assume_canonical:
        # predicate pushdown: the scan emits ONLY scheduled rows — html of
        # the other 95%+ never enters the object store, and the remaining
        # decode work parallelizes across part files
        expr = pc.field("url").isin(list(smap.keys()))
        ds = rd.read_parquet(paths, filter=expr)
    else:
        ds = rd.read_parquet(paths)
    ds = ds.map_batches(_FetchFilter(sched_ref), batch_format="pyarrow").materialize()
    if ds.count() == 0:
        return rd.from_arrow(_fetched_schema_table().drop_columns(["raw_url"]))
    pairs = ds.select_columns(["url", "raw_url"]).to_pandas()
    if pairs["url"].duplicated().any():
        winners = set(
            pairs.sort_values(["url", "raw_url"], kind="mergesort")
            .drop_duplicates("url", keep="first")["raw_url"]
        )
        win_ref = ray.put(winners)

        def keep_winner(t: pa.Table) -> pa.Table:
            w = ray.get(win_ref)
            mask = np.fromiter(
                (r in w for r in t["raw_url"].to_pylist()),
                dtype=bool,
                count=t.num_rows,
            )
            return t.filter(pa.array(mask))

        ds = ds.map_batches(keep_winner, batch_format="pyarrow")
    return ds.drop_columns(["raw_url"])
