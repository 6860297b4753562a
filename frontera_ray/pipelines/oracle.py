"""Pure-Python, single-threaded crawl oracle — the conformance reference.

Plays the role of the reference's local-mode manager + memory backend
(LocalFrontierManager frontera/core/manager.py:~100-400 + memory backend
heaps — approximate cites, SURVEY.md §0), whose deterministic golden URL
sequences the reference's tests assert (tests/backends.py). The Ray pipeline
must reproduce, at any parallelism:

    (a) the exact scheduled-URL sequence (crawl_order),
    (b) the final URL-seen fingerprint set,
    (c) byte-identical `text` per fetched url.

No Ray, no pandas — dicts, sorted() with explicit total-order keys. Shares
only the leaf kernels with the engine (canonicalize / sha1 / crc32 / href
regex / robots parser), so what it cross-checks is the *orchestration*:
scheduling, budgets, state machine, dedup winners, score propagation.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from .. import schema as S
from ..config import CrawlConfig
from ..functions.urlnorm import canonicalize, extract_host, resolve_link
from ..functions.fingerprint import fp64 as fp64_of, signed_crc32
from ..stages.extract import _HREF_RE
from ..state.politeness import RobotsRules
from ..strategy import splitmix64


class _Row:
    __slots__ = ("url", "fp", "host", "partition", "depth", "score", "disc_epoch")

    def __init__(self, url, fp, host, partition, depth, score, disc_epoch):
        self.url = url
        self.fp = fp
        self.host = host
        self.partition = partition
        self.depth = depth
        self.score = score
        self.disc_epoch = disc_epoch


def _policy_key(row: _Row, policy: str, seed: int):
    if policy in ("basic", "opic"):
        return (-row.score, row.fp)
    if policy == "bfs":
        return (row.depth, row.disc_epoch, row.fp)
    if policy == "dfs":
        return (-row.depth, row.disc_epoch, row.fp)
    if policy == "fifo":
        return (row.disc_epoch, row.fp)
    if policy == "lifo":
        return (-row.disc_epoch, row.fp)
    if policy == "random":
        rk = int(splitmix64(np.array([row.fp], dtype=np.uint64) ^ np.uint64(seed))[0])
        return (rk, row.fp)
    raise ValueError(policy)


class OracleCrawl:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        # ---- load pages: canonical url → (text, html); winner = min raw url
        pages: dict[str, tuple[str, bytes, str]] = {}
        raw_of: dict[str, str] = {}
        for path in cfg.pages_paths:
            t = pq.read_table(path)
            for url, html, text in zip(
                t["url"].to_pylist(), t["html"].to_pylist(), t["text"].to_pylist()
            ):
                cu = canonicalize(url)
                if cu not in pages or url < raw_of[cu]:
                    pages[cu] = (text, html, url)
                    raw_of[cu] = url
        self.pages = pages
        # ---- robots: host → rules; winner = lexicographically smallest body
        bodies: dict[str, str] = {}
        for cu, (text, _html, _raw) in pages.items():
            if cu.endswith("/robots.txt"):
                h = extract_host(cu)
                if h not in bodies or text < bodies[h]:
                    bodies[h] = text
        self.robots = {h: RobotsRules(b) for h, b in bodies.items()}
        # Crawl-delay → per-host per-epoch cap (scheduler mirror; robots
        # rules and their delays both apply only under obey_robots)
        self.host_caps = (
            {
                h: max(1, int(cfg.epoch_seconds // r.crawl_delay))
                for h, r in self.robots.items()
                if r.crawl_delay
            }
            if cfg.obey_robots
            else {}
        )

        self.seen: set[int] = set()
        self.queued: dict[int, _Row] = {}
        self.crawl_order: list[tuple[int, str, int, bool]] = []
        self.out: dict[str, str] = {}
        self.seq = 0

    # ---- helpers -------------------------------------------------------
    def _allowed(self, host: str, url: str) -> bool:
        if not self.cfg.obey_robots:
            return True
        r = self.robots.get(host)
        if r is None:
            return True
        path = url.split(host, 1)[1] if host in url else "/"
        return r.allowed(path or "/")

    def _admit(self, url: str, depth: int, score: float, epoch: int) -> None:
        fp = fp64_of(url)
        if fp in self.seen:
            return
        host = extract_host(url)
        if not self._allowed(host, url):
            return
        self.seen.add(fp)
        part = signed_crc32(host) % self.cfg.num_partitions
        self.queued[fp] = _Row(url, fp, host, part, depth, score, epoch)

    # ---- seeds ---------------------------------------------------------
    def read_seeds(self) -> None:
        t = pq.read_table(self.cfg.seeds_path)
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            self._admit(canonicalize(url), 0, float(score), -1)

    # ---- scheduler (mirror of stages/schedule.py semantics) -----------
    def schedule(self) -> list[_Row]:
        cfg = self.cfg
        batch: list[tuple] = []  # (partition, budget_rank, key, row)
        by_part: dict[int, list[_Row]] = {}
        for row in self.queued.values():
            by_part.setdefault(row.partition, []).append(row)
        for part in sorted(by_part):
            rows = sorted(
                by_part[part], key=lambda r: _policy_key(r, cfg.policy, cfg.seed)
            )
            per_host: dict[str, int] = {}
            capped = []
            for r in rows:
                rank = per_host.get(r.host, 0)
                cap = min(
                    cfg.max_requests_per_host,
                    self.host_caps.get(r.host, cfg.max_requests_per_host),
                )
                if rank < cap:
                    capped.append((rank, _policy_key(r, cfg.policy, cfg.seed), r))
                per_host[r.host] = rank + 1
            capped.sort(key=lambda x: (x[0], x[1]))
            for rank, key, r in capped[: cfg.max_next_requests]:
                batch.append((part, rank, key, r))
        batch.sort(key=lambda x: (x[0], x[1], x[2]))
        return [r for _, _, _, r in batch]

    # ---- one epoch -----------------------------------------------------
    def run_epoch(self, epoch: int) -> int:
        cfg = self.cfg
        sched = self.schedule()
        if not sched:
            return 0
        # admission buffer for this epoch: child fp → edges
        edges: dict[int, list[tuple]] = {}
        child_info: dict[int, tuple[str, int]] = {}
        for row in sched:
            hit = row.url in self.pages
            self.crawl_order.append((self.seq, row.url, epoch, hit))
            self.seq += 1
            del self.queued[row.fp]
            if not hit:
                continue
            text, html, _raw = self.pages[row.url]
            self.out[row.url] = text
            hrefs = _HREF_RE.findall(html) if html else []
            outdeg = len(hrefs)
            for h in hrefs:
                child = canonicalize(resolve_link(row.url, h.decode("utf8", "ignore")))
                if not child.startswith(("http://", "https://")):
                    continue
                cdepth = row.depth + 1
                if cfg.max_depth is not None and cdepth > cfg.max_depth:
                    continue
                cfp = fp64_of(child)
                edges.setdefault(cfp, []).append(
                    (cdepth, row.fp, child, row.score, outdeg)
                )
                child_info[cfp] = (child, cdepth)
        # dedup per child: winner = min (depth, parent_fp, url); opic cash sum
        for cfp, es in sorted(edges.items()):
            es.sort(key=lambda e: (e[0], e[1], e[2]))
            depth, _pfp, url, _ps, _od = es[0]
            if cfg.policy == "opic":
                score = sum(ps / max(1, od) for _, _, _, ps, od in es)
            else:
                score = 1.0 / (depth + 1)
            self._admit(url, depth, score, epoch)
        return len(sched)

    # ---- full run ------------------------------------------------------
    def run(self) -> dict:
        self.read_seeds()
        epochs = 0
        for epoch in range(self.cfg.max_epochs):
            if not self.queued:
                break
            if self.run_epoch(epoch) == 0:
                break
            epochs += 1
        return {
            "epochs": epochs,
            "crawl_order": self.crawl_order,
            "seen": np.array(sorted(self.seen), dtype=np.uint64),
            "out": self.out,
        }


def run_oracle(cfg: CrawlConfig) -> dict:
    return OracleCrawl(cfg).run()
