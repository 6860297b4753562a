"""Fetch simulator: the scheduled batch "fetches" pages from the Parquet
pages table (replaces the reference's network side — Scrapy downloader via
frontera/contrib/scrapy/schedulers/frontier.py:~1-150; approximate cites,
SURVEY.md §0 — per BASELINE.json there is no network: fetching IS a lookup
into the Common-Crawl-style pages table).

Join strategy (SURVEY.md §2.4 J1): the scheduled batch is SMALL by
construction (≤ P × max_next_requests), so this is the canonical
**broadcast join**: ``ray.put`` the scheduled url→meta arrays once, scan
ONLY the pages partitions that contain scheduled hosts (the pages table is
laid out as one part file per signed_crc32(host) % n_parts — partition
pruning at the read), and filter inside map_batches. No shuffle; the scan
parallelizes over the pruned part files.

Everything in the batch path is Arrow-vectorized (round-2 fix for the
round-1 per-row membership loop): membership + meta attach are ONE
``pc.index_in`` against the broadcast url array, and n_links is ONE
``pc.count_substring_regex`` over the html column. When the pages table
stores canonical URLs (``assume_canonical``) the per-batch
canonicalization pass is skipped and the caller may keep the chain lazy
(single-execution epochs). With ``pages_ds`` the scan is replaced by
already-materialized object-store blocks shared across epochs.

Duplicate canonical urls in the pages table (dirty URL variants) are
resolved deterministically: winner = lexicographically smallest raw url.
The winner filter is applied by the CALLER (pipelines/crawl.py) from the
same tiny meta projection it already collects — one less execution barrier.

Output is a Dataset (html stays distributed — never collected to the
driver); the driver gets only the tiny fetched-meta frame for state
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

# counting twin of stages/extract._HREF_RE (re2 syntax, no capture groups)
_HREF_COUNT_PATTERN = r'(?i)<a\s[^>]*href="[^"#]*(?:#[^"]*)?"'


class _FetchFilter:
    """map_batches callable: keep scheduled page rows, attach scheduled meta
    from the broadcast arrays — fully vectorized (index_in + array takes)."""

    def __init__(self, sched_ref, assume_canonical: bool = False):
        self.sched_ref = sched_ref
        self.assume_canonical = assume_canonical
        self._s = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._s is None:
            self._s = ray.get(self.sched_ref)  # once per actor/task
        s = self._s
        raw = batch["url"]
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        canon = raw if self.assume_canonical else canonicalize_array(raw)
        idx = pc.index_in(canon, value_set=s["url"])
        keep = idx.is_valid()
        if not pc.any(keep).as_py():
            return _fetched_schema_table()
        sub = batch.filter(keep)
        canon_sub = canon.filter(keep)
        ii = idx.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        n_links = pc.fill_null(
            pc.count_substring_regex(sub["html"], pattern=_HREF_COUNT_PATTERN), 0
        )
        return pa.table(
            {
                "url": canon_sub,
                "raw_url": sub["url"],
                "warc_ts": sub["warc_ts"],
                "html": sub["html"],
                "text": sub["text"],
                "lang": sub["lang"],
                "fp64": pa.array(s["fp64"][ii], pa.uint64()),
                "score": pa.array(s["score"][ii], pa.float64()),
                "depth": pa.array(s["depth"][ii], pa.int32()),
                "partition": pa.array(s["partition"][ii], pa.int32()),
                "host": pc.take(s["host"], pa.array(ii)),
                "n_links": pc.cast(n_links, pa.int32()),
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


def fetched_empty() -> pa.Table:
    """Empty table in the fetched schema (incl. raw_url)."""
    return _fetched_schema_table()


def fetch_sim(
    scheduled: pd.DataFrame,
    pages_paths: list[str],
    assume_canonical: bool = False,
    pages_ds=None,
    materialize: bool = True,
):
    """scheduled (driver df with url/fp64/score/depth/partition/host) →
    fetched MATERIALIZED Dataset (see _FetchFilter output schema, INCLUDING
    raw_url — the caller resolves dirty-variant winners from its meta
    projection and drops the column). Bounded by the politeness budget, so
    materializing is safe.

    pages_ds: optionally a MATERIALIZED pages Dataset (cfg.
    cache_pages_in_memory) — epochs then filter object-store blocks
    zero-copy instead of re-decoding parquet."""
    urls = scheduled["url"].tolist()
    sched_ref = ray.put(
        {
            "url": pa.array(urls, pa.string()),
            "fp64": scheduled["fp64"].to_numpy(dtype=np.uint64),
            "score": scheduled["score"].to_numpy(dtype=np.float64),
            "depth": scheduled["depth"].to_numpy(dtype=np.int32),
            "partition": scheduled["partition"].to_numpy(dtype=np.int32),
            "host": pa.array(scheduled["host"].tolist(), pa.string()),
        }
    )
    if pages_ds is not None:
        ds = pages_ds
    else:
        n_parts = len(pages_paths)
        # prune: only pages parts whose host-partition appears in the batch
        hh = crc32_batch(scheduled["host"].tolist())
        needed = sorted(set(int(p) for p in (hh % n_parts)))
        # NB: a parquet `filter=isin(urls)` pushdown was MEASURED SLOWER
        # here: the url list serializes into every read task (MBs each) and
        # unsorted urls defeat row-group statistics pruning, so nothing is
        # actually skipped. The broadcast-array index_in filter below ships
        # the scheduled set ONCE via the object store and filters at Arrow
        # speed.
        ds = rd.read_parquet([pages_paths[p] for p in needed])
    out = ds.map_batches(
        _FetchFilter(sched_ref, assume_canonical), batch_format="pyarrow"
    )
    # materialize=False (single-pass epochs over canonical stores): the
    # caller fuses this chain with write-out/extract/admit — ONE streaming
    # execution, html never re-enters the object store as a second copy
    return out.materialize() if materialize else out


def winner_raw_urls(meta: pd.DataFrame) -> set | None:
    """Dirty-variant resolution over the tiny fetched-meta frame: for each
    canonical url keep the lexicographically smallest raw_url. Returns None
    when there are no collisions (the common case — skip the filter)."""
    if not meta["url"].duplicated().any():
        return None
    return set(
        meta.sort_values(["url", "raw_url"], kind="mergesort")
        .drop_duplicates("url", keep="first")["raw_url"]
    )
