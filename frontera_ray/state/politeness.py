"""robots.txt rules + per-host politeness gating.

Reference: the discovery strategy fetches/parses robots and drops disallowed
URLs, with per-domain budgets (frontera/strategy/discovery/__init__.py:~1-500,
stdlib robotparser; DomainCache for per-domain state —
contrib/backends/hbase/domaincache.py:~1-250; approximate cites, SURVEY.md §0).

Here: robots bodies live in the pages table itself (rows whose path is
``/robots.txt``, per FIXTURES.md §2). At crawl start one distributed pass
collects (host → rules); the parsed rule set is broadcast via ``ray.put``
and consulted inside map_batches — a lookup, not a shuffle.

Matching semantics: user-agent ``*`` groups only; longest-prefix match wins
between Allow and Disallow (Google/RFC 9309 style), Allow wins ties; empty
Disallow value allows everything. Deterministic, no regex wildcards (v1).

Scale note (10^8 hosts): the broadcast dict becomes a *sharded politeness
actor pool* keyed by the same ``signed_crc32(host) % K`` partitioner; the
gate stage then routes per-batch host arrays to shards exactly like the
seen-set does. The broadcast path is kept because at sandbox scale the rule
table is tiny and one object-store put beats K actor round-trips.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


class RobotsRules:
    """Parsed rules for one host: list of (allow: bool, prefix: str)
    plus the ``Crawl-delay`` directive (seconds; non-standard but honored
    by the reference's discovery strategy — rate-limits via the scheduler's
    per-host-per-epoch cap, see stages/schedule.py)."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, body: str):
        self.rules: list[tuple[bool, str]] = []
        self.crawl_delay: float | None = None
        applies = False
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                applies = val == "*"
            elif applies and key in ("allow", "disallow"):
                if val == "":
                    continue  # empty Disallow/Allow = no rule
                self.rules.append((key == "allow", val))
            elif applies and key == "crawl-delay":
                try:
                    d = float(val)
                except ValueError:
                    continue
                if d > 0:
                    self.crawl_delay = d

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for allow, prefix in self.rules:
            if path.startswith(prefix):
                plen = len(prefix)
                if plen > best_len or (plen == best_len and allow):
                    best_len = plen
                    best_allow = allow
        return best_allow


class PolitenessIndex:
    """host → RobotsRules; hosts absent from the index allow everything."""

    def __init__(self, host_rules: dict[str, str]):
        self.rules = {h: RobotsRules(b) for h, b in host_rules.items()}

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        rules = self.rules
        for i, (h, u) in enumerate(zip(hosts, urls)):
            r = rules.get(h)
            if r is not None:
                path = u.split(h, 1)[1] if h and h in u else urlsplit(u).path
                out[i] = r.allowed(path or "/")
        return out


class PolitenessShard:
    """One shard of the robots/domain-state pool (T4 actor-pool scale path;
    reference analogue: DomainCache, hbase/domaincache.py:~1-250 approx).
    Wrapped in ray.remote by make_politeness_pool; keyed by the global host
    partitioner signed_crc32(host) % K."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.index = PolitenessIndex({})

    def load(self, host_rules: dict[str, str]) -> int:
        self.index = PolitenessIndex(host_rules)
        return len(host_rules)

    def allowed(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        return self.index.allowed_mask(hosts, urls)


def make_politeness_pool(num_shards: int, host_rules: dict[str, str]) -> list:
    """K politeness shard actors loaded with their slice of the rules."""
    import ray

    from ..functions.fingerprint import signed_crc32

    RemoteShard = ray.remote(PolitenessShard)
    handles = [RemoteShard.remote(i) for i in range(num_shards)]
    slices: list[dict[str, str]] = [{} for _ in range(num_shards)]
    for h, b in host_rules.items():
        slices[signed_crc32(h) % num_shards][h] = b
    ray.get([s.load.remote(sl) for s, sl in zip(handles, slices)])
    return handles


class PolitenessClient:
    """Uniform gate interface over the two placements (SURVEY.md §2.3 T4):
    broadcast index (one ray.put, lookup in-process) or sharded actor pool
    (host_hash-routed batch calls). Picklable into map_batches stages."""

    def __init__(self, broadcast_ref=None, shard_handles: list | None = None):
        self.broadcast_ref = broadcast_ref
        self.shards = shard_handles
        self._idx = None

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        import ray

        if self.shards is None:
            if self._idx is None:
                self._idx = ray.get(self.broadcast_ref)
            return self._idx.allowed_mask(hosts, urls)
        from ..functions.fingerprint import crc32_batch

        k = len(self.shards)
        shard_of = crc32_batch(list(hosts)) % k
        out = np.ones(len(urls), dtype=bool)
        futs = []
        for s in np.unique(shard_of):
            idx = np.nonzero(shard_of == s)[0]
            futs.append(
                (
                    idx,
                    self.shards[int(s)].allowed.remote(
                        [hosts[i] for i in idx], [urls[i] for i in idx]
                    ),
                )
            )
        for idx, f in futs:
            out[idx] = ray.get(f)
        return out


def crawl_delay_caps(host_rules: dict[str, str], epoch_seconds: float) -> dict[str, int]:
    """host → per-epoch request cap derived from Crawl-delay (only hosts
    that declare one). Consumed by the scheduler as a per-host override of
    max_requests_per_host (min of the two)."""
    caps: dict[str, int] = {}
    for h, b in host_rules.items():
        d = RobotsRules(b).crawl_delay
        if d:
            caps[h] = max(1, int(epoch_seconds // d))
    return caps


def _robots_pick(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    from ..functions.urlnorm import extract_host_array

    mask = pc.ends_with(batch["url"], "/robots.txt")
    sub = batch.filter(mask)
    hosts = extract_host_array(sub["url"])
    return pa.table({"host": hosts, "body": sub["text"]})


def _finish_robots(tbl) -> dict[str, str]:
    if tbl.empty:  # no robots.txt rows anywhere → everything allowed
        return {}
    # deterministic winner on duplicate hosts: lexicographically smallest body
    tbl = tbl.sort_values(["host", "body"]).drop_duplicates("host", keep="first")
    return dict(zip(tbl["host"], tbl["body"]))


def collect_robots(pages_paths: list[str], pages_ds=None) -> dict[str, str]:
    """Distributed pass over the pages table → {host: robots body}; result
    is one small row per host, the only thing collected to the driver.

    Parquet path: one plain Ray task per part file scans the (cheap) url
    column per row group and decodes `text` ONLY for row groups containing
    robots rows — with the fixture's robots-rows-last layout that is one
    row group per file instead of the whole text column.
    pages_ds path (cache_pages_in_memory): same pick over the already-
    materialized blocks — no second parquet scan at all."""
    import pandas as pd
    import ray

    if pages_ds is not None:
        tbl = pages_ds.map_batches(_robots_pick, batch_format="pyarrow").to_pandas()
        return _finish_robots(tbl)

    futs = [_collect_file_robots.remote(p) for p in pages_paths]
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return {}
    tbl = pa.concat_tables(tables).to_pandas()
    return _finish_robots(tbl)


import ray as _ray


@_ray.remote
def _collect_file_robots(path: str) -> pa.Table:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    parts = []
    for rg in range(pf.num_row_groups):
        urls = pf.read_row_group(rg, columns=["url"])["url"]
        mask = pc.ends_with(urls, "/robots.txt")
        if pc.any(mask).as_py():
            parts.append(_robots_pick(pf.read_row_group(rg, columns=["url", "text"])))
    if not parts:
        return pa.table({"host": pa.array([], pa.string()), "body": pa.array([], pa.string())})
    return pa.concat_tables(parts)
